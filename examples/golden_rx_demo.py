"""Demo: golden (numpy) RX chain over synthetic captures, all four modes.

Usage: python examples/golden_rx_demo.py [--blocked]

Acceptance config 1 shape (BASELINE.json configs[0]): 192 kHz IQ -> NCO mix
-> CIC/FIR decimate -> channel BPF -> AGC -> 48 kHz audio; here run on the
A0 golden model for every demod mode, scored vs the clean modulating audio.
"""

import argparse

import numpy as np

from radioframe.diag.metrics import audio_snr_db, power_db
from radioframe.golden import model as G
from radioframe.io import fixtures as FX
from radioframe.ops import filter_design as FD

FS_IQ, FS_AUDIO = 192_000.0, 48_000.0


def rx_chain(iq, offset_hz, mode, blocked=False):
    """Golden RX: mix -> CIC(2,4) -> compFIR(/2) -> mode filter -> AGC -> demod."""
    comp = FD.compensated_decim_taps(129, 96_000.0, 4000.0, 21_000.0, cic_R=2, cic_N=4)
    bpf_ssb = FD.complex_bandpass_taps(257, 300.0, 2700.0, FS_AUDIO)
    bpf_am = FD.complex_bandpass_taps(257, -5000.0, 5000.0, FS_AUDIO)
    bpf_nfm = FD.complex_bandpass_taps(257, -8000.0, 8000.0, FS_AUDIO)
    bpf_cw = FD.complex_bandpass_taps(257, -250.0, 250.0, FS_AUDIO)

    blocks = np.split(iq, 16) if blocked else [iq]
    st = dict(nco=0.0, cic=None, fir=None, bpf=None, agc=0.0, dc=None, nfm=None, cw=0.0)
    outs = []
    for b in blocks:
        x, st["nco"] = G.nco_mix(b, offset_hz, FS_IQ, st["nco"])
        x, st["cic"] = G.cic_decimate(x, 2, 4, state=st["cic"])
        x, st["fir"] = G.fir_decimate(x, comp, 2, st["fir"])
        bpf = {"ssb": bpf_ssb, "am": bpf_am, "nfm": bpf_nfm, "cw": bpf_cw}[mode]
        x, st["bpf"] = G.ols_filter(x, bpf, st["bpf"])
        if mode == "ssb":
            x, st["agc"], _ = G.agc(x, 0.9995, env0=st["agc"])
            y = G.demod_ssb(x)
        elif mode == "cw":
            x, st["agc"], _ = G.agc(x, 0.9995, env0=st["agc"])
            y, st["cw"] = G.demod_cw(x, 600.0, FS_AUDIO, st["cw"])
        elif mode == "am":
            y, st["dc"] = G.demod_am(x, st["dc"])
        elif mode == "nfm":
            y, st["nfm"] = G.demod_nfm(x, FS_AUDIO, 2500.0, st["nfm"])
        outs.append(np.asarray(y))
    return np.concatenate(outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocked", action="store_true", help="stream in 16 blocks (state handoff path)")
    ap.add_argument("--snr", type=float, default=None, help="add channel noise at this SNR (dB)")
    args = ap.parse_args()

    n = int(FS_IQ * 1.0)
    rows = []
    iq, audio = FX.ssb_capture(FS_IQ, n, 37_000.0, snr_db=args.snr)
    rows.append(("SSB @ +37 kHz", audio, rx_chain(iq, 37_000.0, "ssb", args.blocked)))
    iq, audio = FX.am_capture(FS_IQ, n, 20_000.0, snr_db=args.snr)
    rows.append(("AM  @ +20 kHz", audio, rx_chain(iq, 20_000.0, "am", args.blocked)))
    iq, audio = FX.nfm_capture(FS_IQ, n, -15_000.0, snr_db=args.snr)
    rows.append(("NFM @ -15 kHz", audio, rx_chain(iq, -15_000.0, "nfm", args.blocked)))
    iq, key = FX.cw_capture(FS_IQ, n, 7_000.0, snr_db=args.snr)
    cw_audio = rx_chain(iq, 7_000.0, "cw", args.blocked)
    mode_tag = "blocked-stream" if args.blocked else "one-shot"
    print(f"golden RX chain ({mode_tag}): 192 kHz IQ -> 48 kHz audio")
    for name, ref, out in rows:
        print(f"  {name}: audio SNR {audio_snr_db(ref, out):6.1f} dB   out power {power_db(out):6.1f} dB")
    # CW scored as envelope correlation against the keying pattern
    env = np.abs(cw_audio)
    env_s, _ = G.fir_decimate(env.astype(np.complex128), FD.lowpass_taps(65, 100.0, FS_AUDIO), 1)
    key48 = key[::4][: len(env_s)]
    c = np.corrcoef(np.real(env_s), key48)[0, 1]
    print(f"  CW  @ +7 kHz : keying envelope correlation {c:.3f}")


if __name__ == "__main__":
    main()
