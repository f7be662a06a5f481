"""Failure detection / recovery (SURVEY.md §5): fault injection = dropped /
corrupted input blocks; recovery = checkpoint restart. The stream keeps
running and audio quality recovers after the fault clears."""

import numpy as np
import pytest

from radioframe.api.radio import Radio
from radioframe.core.config import RxConfig
from radioframe.diag.metrics import audio_snr_db
from radioframe.io import fixtures as FX

FS = 192_000.0


def _mk_radio():
    r = Radio(RxConfig(channels=1))
    r.tune(0, 37_000.0)
    r.set_mode(0, "ssb")
    return r


def test_dropped_block_recovers():
    """A dropped (zeroed) block mutes briefly; SNR recovers next blocks."""
    n = 96 * 2048
    iq, truth = FX.ssb_capture(FS, n, 37_000.0)
    blocks = np.split(iq, 12)
    r = _mk_radio()
    outs = []
    for i, b in enumerate(blocks):
        feed = np.zeros_like(b) if i == 6 else b  # fault: block 6 lost
        outs.append(r.process(feed)[0])
    Ta = outs[0].shape[-1]
    # blocks after the fault recover to healthy SNR
    post = np.concatenate(outs[8:], axis=-1)
    truth_post = truth[8 * Ta:]
    snr = audio_snr_db(truth_post[: len(post)], post, trim=1024)
    assert snr > 25.0, f"post-fault SNR {snr:.1f} dB"
    assert np.all(np.isfinite(np.concatenate(outs, axis=-1)))


@pytest.mark.slow
def test_corrupt_block_does_not_poison_stream():
    """A NaN-corrupted block must not leave NaNs in subsequent state/audio
    after a checkpoint restore (the firmware-watchdog-reset analog)."""
    n = 8 * 8192
    iq, _ = FX.ssb_capture(FS, n, 37_000.0)
    blocks = np.split(iq, 8)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        r = _mk_radio()
        for b in blocks[:4]:
            r.process(b)
        r.save(d, epoch=4)
        bad = blocks[4].copy()
        bad[100:200] = np.nan
        out_bad = r.process(bad)
        assert not np.all(np.isfinite(out_bad))  # fault detected in output
        # recovery: restore last epoch, replay from there
        r2 = _mk_radio()
        r2.load(d)
        for b in blocks[4:]:
            out = r2.process(b)
            assert np.all(np.isfinite(out))


def test_checkpoint_survives_config_roundtrip(tmp_path):
    """Epoch listing + latest_epoch behave with multiple snapshots."""
    from radioframe.core.checkpoint import StreamCheckpointer

    iq, _ = FX.ssb_capture(FS, 2 * 8192, 37_000.0)
    r = _mk_radio()
    r.process(iq[:8192])
    ck = str(tmp_path / "ck")
    r.save(ck, epoch=1)
    r.process(iq[8192:])
    r.save(ck, epoch=2)
    s = StreamCheckpointer(ck)
    assert s.epochs() == [1, 2]
    assert s.latest_epoch() == 2
