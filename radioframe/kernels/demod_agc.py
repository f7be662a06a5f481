"""Pallas TPU kernel: fused demod bank + AGC for the channelizer back end.

After kernels/pfb_dft.py, the channelizer's remaining cost is the audio
stage: the XLA demod bank + AGC makes ~6 full-rate passes over the (M, F)
channel matrix (CW oscillator materialization, AM envelope + DC scan, NFM
conjugate product + atan2, masked select, AGC envelope scans). Here one
kernel reads the channel planes ONCE in frame-major (F, M) layout —
channels on lanes, frames on sublanes/grid — and produces the selected,
AGC'd audio plus the per-channel power and (optionally) averaged
waterfall power lines.

Per-sample recursions stay EXACT across the sequential grid:

- AM DC block (y[f] = e[f] - e[f-1] + a y[f-1]): within-tile prefix by one
  lower-triangular a^{g-j} matmul on the MXU (the ops/scans.py round-3
  trick, in-kernel), carry in VMEM scratch.
- AGC release max-decay: global a^{-f} rescale inside the tile -> log-step
  shifted-max cummax over sublanes, carry in scratch.
- NFM discriminator: one-frame lookback from scratch.
- CW beat tone: int32 DDS angles computed per frame index (all channels
  share the tone word, but the kernel keeps the general per-channel form).

SAM needs whole-block statistics (two-pass) and is NOT supported here —
the chain falls back to the dense XLA bank when SAM is enabled. Per-mode
AGC constants arrive pre-gathered per channel (host-side table lookup),
so there is no in-kernel gather. Attack smoothing (r4): the one-pole lpf
over the release envelope runs as one lower-triangular a^{g-j} MXU matmul
per DISTINCT nonzero alpha in the static mode table (<=6), mask-selected
per channel — exact, no rescale bound (negative powers never appear).
Hang stays dense-only: its (Wmax-1, M) carried envelope history (hang
windows span hundreds of frames) would dominate the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radioframe.ops import demod as demod_op

_SCALE = np.float32(2.0 * np.pi / 2.0 ** 32)
_DC_POLE = 0.995  # dc_block default pole (ops/demod.py)

# odd polynomials for atan on [0, 1]; Pallas TPU has no atan2 primitive,
# so the kernel builds it from one of these. The NFM audio error is
# poly_err x dev_scale (= fs_channel / (2 pi deviation)), so the degree is
# chosen PER CONFIG by atan_coeffs(): degree 9 (|err| < 1.3e-5 rad) where
# dev_scale <= 4 (err x 4 = 5e-5, 4x under the 2e-4 parity tolerance —
# halves the Horner chain in the compute-bound single-pass channelizer,
# r4), degree 15 (|err| < 1e-7) otherwise.
_ATAN_C9 = (0.9998787433, -0.3304055736, 0.1804126844, -0.0854083083,
            0.0209318117)
_ATAN_C15 = (0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
             0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580)


def atan_coeffs(dev_scale: float):
    """Pick the atan polynomial so err x dev_scale stays ~4x under the
    2e-4 audio parity tolerance for ANY fs_channel/deviation config."""
    return _ATAN_C9 if dev_scale <= 4.0 else _ATAN_C15


def _atan2(y, x, coeffs=_ATAN_C15):
    """Elementwise atan2 from mul/add/select only (Pallas-lowerable)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    p = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        p = p * s + jnp.float32(c)
    r = p * t  # atan(t), t in [0, 1]
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _kernel(TF, M, grid, fs, dev_scale, wf_avg, en_ssb, en_lsb, en_cw, en_am,
            en_nfm, alphas, apply_agc,
            yr_ref, yi_ref, mode_ref, cw_word_ref, cw_acc_ref, rel_ref,
            al_ref, tgt_ref, mg_ref, ltri_ref, atri_ref, dcol_ref, st_in_ref,
            pa_ref, pinv_ref, pc_ref, ps_ref,
            audio_ref, wf_ref, st_out_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed():
        # carry rows: [0]=am x_prev, [1]=am y_prev, [2]=nfm_last re,
        # [3]=nfm_last im, [4]=agc release env, [5]=agc attack lpf,
        # [6]=power accum
        carry_ref[...] = st_in_ref[...]

    audio, wf = demod_agc_tile(
        i, TF, wf_avg, en_ssb, en_lsb, en_cw, en_am, en_nfm, alphas,
        dev_scale, yr_ref[...], yi_ref[...], mode_ref[...], cw_word_ref[...],
        cw_acc_ref[...], rel_ref[...], al_ref[...], tgt_ref[...], mg_ref[...],
        ltri_ref, atri_ref, dcol_ref, carry_ref,
        pre=(pa_ref[...], pinv_ref[...], pc_ref[...], ps_ref[...]),
        apply_agc=apply_agc)
    audio_ref[...] = audio
    wf_ref[...] = wf[None]

    @pl.when(i == grid - 1)
    def _emit_state():
        st_out_ref[...] = carry_ref[...]


def demod_agc_tile(i, TF, wf_avg, en_ssb, en_lsb, en_cw, en_am, en_nfm,
                   alphas, dev_scale, xr, xi, mode, cw_word, cw_acc, rel, al,
                   tgt, mg, ltri_ref, atri_ref, dcol_ref, carry_ref,
                   pre=None, apply_agc=True, emit_env=False):
    """One frame-tile of the demod bank + AGC, rank-agnostic.

    ``xr``/``xi`` are (TF, M) or (TF, M1, M2) VALUES (channels on the
    trailing dim(s)); the per-channel constants are (1, M)/(1, M1, M2);
    ``carry_ref`` is the (7, ...) VMEM carry. Shared by the standalone
    FusedDemodAgc kernel and the single-pass channelizer kernel
    (kernels/channelizer_one.py) — the math is identical, only the channel
    layout differs. Returns (audio, wf_tile).

    ``apply_agc=False`` (static) skips the AGC stages and returns PRE-gain
    demod audio: the time-sharded single-pass channelizer
    (shard/channelizer.py) runs the demod in-kernel per shard — its AM/NFM
    lookback seeds are locally computable from the wideband halo — but
    completes release/attack/gain ACROSS shards in XLA on the audio-rate
    output, because the release max-decay and attack one-pole carries
    depend on upstream shards while the in-kernel forms assume a known
    entering envelope. Carry rows 4/5 are left untouched in that mode.

    ``emit_env=True`` (static, requires apply_agc=False): the release
    max-decay env IS computed in-kernel (carry row 4 seeded/updated as in
    the apply path) and returned as a third output — but attack/gain still
    are not. With the env carry zero-seeded this gives each time shard its
    LOCAL zero-entering release envelope, which the sharded channelizer
    completes across shards with one elementwise max (r5, ROADMAP
    open-work #4) — valid only when AM is statically disabled: the AM
    DC-block's cross-shard audio fixup would change |audio| after the
    in-kernel env had already latched it.

    ``pre``: optional (A, invA, cw_cf, cw_sf) tile-constant tables, each
    shaped like xr's tile — A = rel**f1 (+ its reciprocal, killing the
    per-tile divide) and the CW fine-tone cos/sin(word*f) are the same
    every grid step, so callers precompute them ONCE per block host-side
    instead of paying pow/cos/sin/div arrays per tile (measured 6.01 ->
    6.96 Gsps on the single-pass channelizer); None computes them
    in-kernel."""
    cdim = xr.shape[1:]  # trailing channel dims
    ones = (1,) * len(cdim)
    audio = jnp.zeros(xr.shape, jnp.float32)
    # |x|^2 is shared by the AM envelope and the waterfall/power pass —
    # compute it once (r4: it was built twice per tile)
    p = xr * xr + xi * xi

    # --- SSB / LSB: 2*Re -------------------------------------------------
    if en_ssb or en_lsb:
        mask = jnp.zeros((1,) + cdim, jnp.bool_)
        if en_ssb:
            mask = mask | (mode == demod_op.SSB)
        if en_lsb:
            mask = mask | (mode == demod_op.LSB)
        audio = audio + jnp.where(mask, 2.0 * xr, 0.0)

    # --- CW: beat-tone mix up (int32 DDS angles at frame index) ----------
    if en_cw:
        if pre is not None:
            # factorized DDS: angle = coarse(acc + word*i*TF) + fine(word*f)
            # mod 2^32 — the int32 wraps shift the float angles by 2*pi
            # multiples, so the product of the two rotations is exact
            ang_c = ((cw_acc + cw_word * jnp.int32(i * TF))
                     .astype(jnp.float32) * _SCALE)
            cc, sc = jnp.cos(ang_c), jnp.sin(ang_c)   # (1, ...) per tile
            c = cc * pre[2] - sc * pre[3]
            s = cc * pre[3] + sc * pre[2]
        else:
            g = (i * TF) + jax.lax.broadcasted_iota(jnp.int32, xr.shape, 0)
            ang = (cw_acc + cw_word * g).astype(jnp.float32) * _SCALE
            c, s = jnp.cos(ang), jnp.sin(ang)
        y_cw = 2.0 * (xr * c - xi * s)
        audio = audio + jnp.where(mode == demod_op.CW, y_cw, 0.0)

    # --- AM: envelope + DC block (triangular-matmul prefix) --------------
    if en_am:
        env = jnp.sqrt(p)
        xprev = jnp.concatenate([carry_ref[0:1], env[: TF - 1]], axis=0)
        b = env - xprev
        # ltri[g, j] = a^{g-j} (j <= g) already encodes the decay:
        # y[g] = sum_j a^{g-j} b[j] + a^{g+1} carry; dcol_ref[:, 0] is the
        # host-precomputed a^{g+1} column (pow = exp+log on the VPU — every
        # static power is hoisted off the chip, r4 transcendental diet)
        pref = jax.lax.dot_general(ltri_ref[...], b, (((1,), (0,)), ((), ())),
                                   precision=lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        y_am = pref + carry_ref[1:2] * dcol_ref[:, 0:1].reshape((TF,) + ones)
        carry_ref[0:1] = env[TF - 1: TF]
        carry_ref[1:2] = y_am[TF - 1: TF]
        audio = audio + jnp.where(mode == demod_op.AM, y_am, 0.0)

    # --- NFM: discriminator with one-frame lookback ----------------------
    if en_nfm:
        pr = jnp.concatenate([carry_ref[2:3], xr[: TF - 1]], axis=0)
        pi = jnp.concatenate([carry_ref[3:4], xi[: TF - 1]], axis=0)
        dr = xr * pr + xi * pi
        di = xi * pr - xr * pi
        y_nfm = _atan2(di, dr, atan_coeffs(dev_scale)) * jnp.float32(dev_scale)
        carry_ref[2:3] = xr[TF - 1: TF]
        carry_ref[3:4] = xi[TF - 1: TF]
        audio = audio + jnp.where(mode == demod_op.NFM, y_nfm, 0.0)

    def _release_env():
        """Release max-decay env over the tile (rescale + log-step cummax),
        carry row 4 seeded/updated. Shared by apply_agc and emit_env."""
        mag = jnp.abs(audio)
        # ONE pow array A = rel^{f1}; rel^{-f1} = 1/A and rel^{f1+1} = A*rel
        # are derived by mul/div — pow lowers to exp(log) on the VPU, so this
        # cuts 2 of the 3 (TF, M) transcendental arrays per tile (r4)
        f1 = jax.lax.broadcasted_iota(
            jnp.int32, (TF,) + ones, 0).astype(jnp.float32)
        A = (rel ** f1) if pre is None else pre[0]
        w = (mag / A) if pre is None else (mag * pre[1])
        # cummax over the frame (sublane) axis via log-step shifted maxes
        # (lax.cummax is NOT implemented in Mosaic's TPU lowering — tried r4,
        # interpret mode hid the gap until the compiled run)
        k = 1
        while k < TF:
            shifted = jnp.concatenate(
                [jnp.full((k,) + cdim, -np.inf, jnp.float32), w[: TF - k]],
                axis=0)
            w = jnp.maximum(w, shifted)
            k *= 2
        env_r = jnp.maximum(w * A, carry_ref[4:5] * (A * rel))
        carry_ref[4:5] = env_r[TF - 1: TF]
        return env_r

    def _aux():
        if wf_avg == 0:
            return None
        carry_ref[6:7] = carry_ref[6:7] + jnp.sum(p, axis=0, keepdims=True)
        return jnp.mean(p.reshape((TF // wf_avg, wf_avg) + cdim), axis=1)

    # --- AGC: release max-decay (rescale + log-step cummax) --------------
    if not apply_agc:
        # demod-only mode (time-sharded single-pass channelizer): gain is
        # completed across shards in XLA; emit pre-AGC audio + aux (and,
        # under emit_env, the zero-entering local release env — docstring)
        if emit_env:
            return audio, _aux(), _release_env()
        return audio, _aux()
    env_r = _release_env()

    # --- AGC attack: one-pole lpf over env_r (VERDICT r3 ask #5) ---------
    # env[g] = a*env[g-1] + (1-a)*env_r[g], per-channel a from a STATIC
    # <=6-entry mode table — so run the prefix as one lower-triangular
    # a^{g-j} MXU matmul per DISTINCT nonzero alpha (the DC-block trick:
    # exact, no rescale/overflow bound; a^{g-j} underflow -> 0 is correct
    # forgetting) and mask-select per channel; a=0 channels keep env_r.
    if alphas:
        b = (1.0 - al) * env_r
        env = jnp.where(al == 0.0, env_r, 0.0)
        for k, a in enumerate(alphas):
            pref = jax.lax.dot_general(
                atri_ref[k], b, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            # dcol_ref[:, 1+k] = a^{g+1}, host-precomputed
            cand = pref + (carry_ref[5:6]
                           * dcol_ref[:, 1 + k: 2 + k].reshape((TF,) + ones))
            env = env + jnp.where(al == jnp.float32(a), cand, 0.0)
    else:
        env = env_r  # instant attack everywhere: the one-pole is identity
    carry_ref[5:6] = env[TF - 1: TF]
    gain = jnp.minimum(mg, tgt / jnp.maximum(env, 1e-9))
    agc_audio = audio * gain
    audio = jnp.where(mode == demod_op.NFM, audio, agc_audio)

    # --- aux: power accumulation + averaged waterfall power --------------
    # wf_avg == 0 disables the whole aux pass (the flagship back end gets
    # its power metric from the front-end kernel; kernels/ols_demod.py)
    return audio, _aux()


def agc_prefix_consts(TF: int, attack_alphas: tuple):
    """Host-side triangular prefix matrices + decay columns for one tile.

    Shared by FusedDemodAgc, FusedChannelizerOne, and FusedOlsDemod (the
    three kernels embedding demod_agc_tile): ltri (TF, TF) is the DC-block
    a^{g-j} prefix, atri (n_a, TF, TF) one prefix per distinct attack
    alpha, dcol (TF, 1+n_a) the a^{g+1} carry columns."""
    gj = np.subtract.outer(np.arange(TF), np.arange(TF))
    ltri = np.tril(_DC_POLE ** gj).astype(np.float32)
    n_a = max(1, len(attack_alphas))
    atri = np.zeros((n_a, TF, TF), np.float32)
    g1 = np.arange(1, TF + 1, dtype=np.float64)
    dcols = [np.float64(_DC_POLE) ** g1]
    for k, a in enumerate(attack_alphas):
        atri[k] = np.tril(np.float64(a) ** gj).astype(np.float32)
        dcols.append(np.float64(a) ** g1)
    dcol = np.stack(dcols, axis=1).astype(np.float32)
    return ltri, atri, dcol


def demod_pre_tables(TF: int, rel, cw_word, cshape, cw_enabled: bool):
    """Per-block tile-constant tables for demod_agc_tile's ``pre``.

    Shared by FusedDemodAgc and FusedChannelizerOne (one definition — the
    matching coarse rotation lives in the tile body). ``cshape`` is the
    trailing channel shape ((M,) or (M1, M2)); when CW is statically
    disabled the trig tables are not computed (the tile never reads them)
    and ``pa`` placeholders are returned instead."""
    f1 = jnp.arange(TF, dtype=jnp.float32).reshape((TF,) + (1,) * len(cshape))
    pa = jnp.asarray(rel, jnp.float32).reshape((1,) + cshape) ** f1
    pinv = 1.0 / pa
    if cw_enabled:
        fidx = jnp.arange(TF, dtype=jnp.int32) \
            .reshape((TF,) + (1,) * len(cshape))
        fang = (jnp.asarray(cw_word, jnp.int32).reshape((1,) + cshape)
                * fidx).astype(jnp.float32) * _SCALE
        pc, ps = jnp.cos(fang), jnp.sin(fang)
    else:
        pc = ps = pa  # dead inputs, never read in-kernel
    return pa, pinv, pc, ps


def release_decays_ok(release_values, max_tf: int) -> bool:
    """Rescale-boundedness guard for the in-kernel release max-decay
    (mirrors ops/scans.maxdecay_const_ok): rel**(-f1) runs up to
    f1 = max_tf - 1; a fast release would lose precision across the tile.
    Callers must fall back to the dense bank when this returns False."""
    rmin = float(np.min(np.asarray(release_values, np.float64)))
    return 0.0 < rmin < 1.0 and rmin ** -(max_tf - 1) <= 64.0


class FusedDemodAgc:
    """Channelizer back end: (state, yr/yi (F, M) frame-major planes,
    mode (M,), per-channel AGC constants) -> (audio (F, M), aux, state').

    Supports modes {SSB, CW, AM, NFM, LSB}; attack/release AGC (no hang —
    use the dense bank for hang_s > 0).
    """

    MAX_GRID = 256

    def __init__(self, M: int, fs_channel: float, nfm_deviation_hz: float,
                 wf_avg: int = 1, enabled=(0, 1, 2, 3, 4),
                 attack_alphas: tuple = (), interpret: bool = False,
                 apply_agc: bool = True):
        # apply_agc=False: demod-only (pre-gain audio out; AGC applied by
        # the caller in XLA — the hang-capable dense bank or the sharded
        # cross-shard completion; see demod_agc_tile doc)
        self.apply_agc = bool(apply_agc)
        self.M = int(M)
        from radioframe.kernels.pfb_dft import fused_channels_ok

        if not (interpret or self.M % 128 == 0):
            raise ValueError(
                f"FusedDemodAgc needs channels % 128 == 0 when compiled "
                f"(got {self.M}, a partial lane tile — unproven under "
                "Mosaic); use the dense bank for smaller M")
        self.fs = float(fs_channel)
        self.dev_scale = float(fs_channel / (2.0 * np.pi * nfm_deviation_hz))
        self.wf_avg = max(1, int(wf_avg))
        # distinct NONZERO attack one-pole coefficients from the static
        # per-mode AGC table (<=6 values); () = instant attack everywhere.
        # set(): modes sharing a value (e.g. SSB/LSB) must contribute ONE
        # masked candidate, not two — the per-channel select sums them
        self.attack_alphas = tuple(sorted({float(a) for a in attack_alphas
                                           if float(a) != 0.0}))
        # VMEM frame-tile cap; _pick_tf returns a power of two <= this
        self.max_tf = max(8, min(128, (64 * 4096) // self.M))
        if (self.wf_avg & (self.wf_avg - 1)) or self.wf_avg > self.max_tf:
            # ADVICE r3: validate here with a real error instead of crashing
            # at step time on the tf % wf_avg internal assert
            raise ValueError(
                f"waterfall_frame_avg={self.wf_avg} must be a power of two "
                f"<= {self.max_tf} (the fused kernel's VMEM frame-tile cap "
                f"at M={self.M}); use the dense waterfall_from_pfb path for "
                "other averaging factors")
        en = frozenset(map(int, enabled))
        assert demod_op.SAM not in en, "SAM needs the dense XLA bank"
        self.en = en
        self.interpret = interpret

    def release_ok(self, release_values) -> bool:
        """ADVICE r3 guard; see release_decays_ok."""
        return release_decays_ok(release_values, self.max_tf)

    def _pick_tf(self, F: int) -> int:
        cap = self.max_tf
        tf = 1
        while tf * 2 <= min(F, cap) and F % (tf * 2) == 0:
            tf *= 2
        if self.wf_avg:
            assert tf % self.wf_avg == 0, (tf, self.wf_avg)
        return tf

    def __call__(self, yr, yi, mode, cw_word, cw_acc, rel, al, tgt, mg, st_in):
        """st_in: (7, M) f32 carry rows [am_x, am_y, nfm_re, nfm_im, env,
        lpf, power(ignored on input, zeros)]. Returns (audio (F, M) f32,
        power (M,), wf_power ((F/avg, M) or None), st_out (7, M))."""
        F, M = yr.shape
        TF = self._pick_tf(F)
        grid = F // TF
        assert grid <= self.MAX_GRID, "chunk longer blocks upstream"
        ltri, atri, dcol = agc_prefix_consts(TF, self.attack_alphas)
        n_a = atri.shape[0]
        # per-block tile-constant tables (see demod_agc_tile ``pre``)
        pa, pinv, pc, ps = demod_pre_tables(
            TF, rel, cw_word, (M,), demod_op.CW in self.en)
        en = self.en
        kern = functools.partial(
            _kernel, TF, M, grid, self.fs, self.dev_scale, self.wf_avg,
            demod_op.SSB in en, demod_op.LSB in en, demod_op.CW in en,
            demod_op.AM in en, demod_op.NFM in en, self.attack_alphas,
            self.apply_agc)
        row = lambda a, dt: jnp.asarray(a, dt).reshape(1, M)
        wf_rows = F // self.wf_avg
        wf_block = TF // self.wf_avg
        audio, wf, st_out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TF, M), lambda i: (i, 0)),
                pl.BlockSpec((TF, M), lambda i: (i, 0)),
                pl.BlockSpec((1, M), lambda i: (0, 0)),
                pl.BlockSpec((1, M), lambda i: (0, 0)),
                pl.BlockSpec((1, M), lambda i: (0, 0)),
                pl.BlockSpec((1, M), lambda i: (0, 0)),
                pl.BlockSpec((1, M), lambda i: (0, 0)),
                pl.BlockSpec((1, M), lambda i: (0, 0)),
                pl.BlockSpec((1, M), lambda i: (0, 0)),
                pl.BlockSpec((TF, TF), lambda i: (0, 0)),
                pl.BlockSpec((n_a, TF, TF), lambda i: (0, 0, 0)),
                pl.BlockSpec((TF, dcol.shape[1]), lambda i: (0, 0)),
                pl.BlockSpec((7, M), lambda i: (0, 0)),
                pl.BlockSpec((TF, M), lambda i: (0, 0)),
                pl.BlockSpec((TF, M), lambda i: (0, 0)),
                pl.BlockSpec((TF, M), lambda i: (0, 0)),
                pl.BlockSpec((TF, M), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((TF, M), lambda i: (i, 0)),
                # 3D with a leading grid dim: the (wf_block, M) trailing
                # dims match the array exactly (tiling rule: last two dims
                # div-by-(8,128) OR equal to the array dims)
                pl.BlockSpec((1, wf_block, M), lambda i: (i, 0, 0)),
                pl.BlockSpec((7, M), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F, M), jnp.float32),
                jax.ShapeDtypeStruct((grid, wf_block, M), jnp.float32),
                jax.ShapeDtypeStruct((7, M), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((7, M), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=30 * F * M + 2 * len(self.attack_alphas) * F * TF * M,
                bytes_accessed=3 * F * M * 4,
                transcendentals=2 * F * M),
        )(yr, yi, row(mode, jnp.int32), row(cw_word, jnp.int32),
          row(cw_acc, jnp.int32), row(rel, jnp.float32),
          row(al, jnp.float32), row(tgt, jnp.float32), row(mg, jnp.float32),
          jnp.asarray(ltri), jnp.asarray(atri), jnp.asarray(dcol),
          st_in.astype(jnp.float32), pa, pinv, pc, ps)
        wf = wf.reshape(wf_rows, M)
        return audio, st_out[6], wf, st_out
