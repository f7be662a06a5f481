"""Known-answer tests for FT8/WSPR interop tables (VERDICT r2 ask #5).

These activate when verified tables + KAT vectors are checked into
radioframe/data/ (schemas in radioframe/data/__init__.py) and SKIP cleanly
when absent — landing the published constants is a data commit with a
ready-made pass/fail. The consistency tests always run: the runtime
INTEROP_PROVISIONAL flags must track table presence exactly.
"""

import numpy as np
import pytest

from radioframe import data as tables
from radioframe.ops import ft8, wspr


class TestFlagConsistency:
    """INTEROP_PROVISIONAL flips automatically iff tables are present."""

    def test_ft8_flag_tracks_tables(self):
        # provisional iff tables OR packing-KAT vectors are missing
        # (ADVICE r3: the tables npz does not cover the 77-bit packing)
        want = (tables.ft8_tables() is None
                or tables.load_npz("ft8_kats") is None)
        assert ft8.INTEROP_PROVISIONAL == want
        assert bool(ft8.PROVISIONAL_ITEMS) == ft8.INTEROP_PROVISIONAL

    def test_wspr_flag_tracks_tables(self):
        assert wspr.INTEROP_PROVISIONAL == (tables.wspr_tables() is None)
        assert bool(wspr.PROVISIONAL_ITEMS) == wspr.INTEROP_PROVISIONAL

    def test_capabilities_surface_matches(self):
        from radioframe.api.radio import Radio
        from radioframe.core.config import RxConfig

        caps = Radio(RxConfig(channels=1)).capabilities()
        assert ("ft8_interop" in caps) == ft8.INTEROP_PROVISIONAL
        assert ("wspr_interop" in caps) == wspr.INTEROP_PROVISIONAL


class TestLoaderMachinery:
    """The drop-in path works end to end with a synthetic 'real' table —
    proves landing the constants cannot break the machinery (runs always)."""

    def test_general_encoder_roundtrip_on_nonstaircase_h(self, rng):
        from radioframe.ops import fec

        # a random invertible-parity H with the FT8 shape, NOT staircase
        while True:
            H = (rng.random((83, 174)) < 0.06).astype(np.uint8)
            H[np.arange(83), 91 + np.arange(83)] = 1  # help invertibility
            try:
                hp_inv = fec.gf2_inv(H[:, 91:])
                break
            except ValueError:
                continue
        msg = (rng.random(91) < 0.5).astype(np.uint8)
        cw = fec.ldpc_encode_general(H, msg, hp_inv)
        assert cw.shape == (174,) and bool(fec.ldpc_check(H, cw))
        assert np.array_equal(cw[:91], msg)  # systematic

    def test_ft8_tables_dropin_flips_flag(self, tmp_path, monkeypatch, rng):
        """Write a synthetic table file, reload the module: flag flips,
        encode/decode round-trips against the loaded H."""
        import importlib

        from radioframe.ops import fec

        H = fec.ldpc_staircase(91, 83, col_weight=3, seed=7)  # stands in for
        # the published matrix; any valid systematic H exercises the path
        np.savez(tmp_path / "ft8_tables.npz", ldpc_h=H,
                 crc_poly=np.uint32(0x2757))
        monkeypatch.setattr(tables, "_DIR", str(tmp_path))
        try:
            mod = importlib.reload(ft8)
            # tables alone do NOT clear the packing item (ADVICE r3): the
            # npz carries LDPC H + CRC only; packing needs ft8_kats.npz
            assert mod.INTEROP_PROVISIONAL is True
            assert mod.PROVISIONAL_ITEMS == ("77-bit packing offsets",)
            tones = mod.encode_symbols("CQ0ABC", "DE1XYZ", "JO62")
            audio = mod.modulate(tones)
            assert mod.decode(audio) == ("CQ0ABC", "DE1XYZ", "JO62")
        finally:
            monkeypatch.undo()
            importlib.reload(ft8)
        assert ft8.INTEROP_PROVISIONAL == (tables.ft8_tables() is None)

    def test_wspr_tables_dropin_flips_flag(self, tmp_path, monkeypatch, rng):
        import importlib

        sync = (rng.random(162) < 0.5).astype(np.uint8)
        np.savez(tmp_path / "wspr_tables.npz", sync=sync)
        monkeypatch.setattr(tables, "_DIR", str(tmp_path))
        try:
            mod = importlib.reload(wspr)
            assert mod.INTEROP_PROVISIONAL is False
            assert np.array_equal(mod.SYNC, sync)
            syms = mod.encode_symbols("K1ABC", "FN42", 37)
            audio = mod.modulate(syms)
            assert mod.decode(audio) == ("K1ABC", "FN42", 37)
        finally:
            monkeypatch.undo()
            importlib.reload(wspr)
        assert wspr.INTEROP_PROVISIONAL == (tables.wspr_tables() is None)


@pytest.mark.skipif(tables.load_npz("ft8_kats") is None,
                    reason="no FT8 known-answer vectors in radioframe/data/")
class TestFt8KnownAnswers:
    """Activate when ft8_kats.npz lands (vectors from an independent,
    verified encoder): our encoder must reproduce the published tone
    sequences exactly, and decode them back."""

    def test_encode_matches_published_tones(self):
        k = tables.load_npz("ft8_kats")
        for ct, de, gr, tones in zip(k["call_to"], k["call_de"], k["grid"],
                                     k["tones"]):
            got = ft8.encode_symbols(str(ct), str(de), str(gr))
            np.testing.assert_array_equal(got, tones)

    def test_decode_published_tones(self):
        k = tables.load_npz("ft8_kats")
        for ct, de, gr, tones in zip(k["call_to"], k["call_de"], k["grid"],
                                     k["tones"]):
            audio = ft8.modulate(np.asarray(tones, np.int64))
            assert ft8.decode(audio) == (str(ct), str(de), str(gr))


@pytest.mark.skipif(tables.load_npz("wspr_kats") is None,
                    reason="no WSPR known-answer vectors in radioframe/data/")
class TestWsprKnownAnswers:
    def test_encode_matches_published_symbols(self):
        k = tables.load_npz("wspr_kats")
        for cs, gr, pw, syms in zip(k["callsign"], k["grid"], k["power"],
                                    k["symbols"]):
            got = wspr.encode_symbols(str(cs), str(gr), int(pw))
            np.testing.assert_array_equal(got, syms)

    def test_decode_published_symbols(self):
        k = tables.load_npz("wspr_kats")
        for cs, gr, pw, syms in zip(k["callsign"], k["grid"], k["power"],
                                    k["symbols"]):
            audio = wspr.modulate(np.asarray(syms, np.uint8))
            assert wspr.decode(audio) == (str(cs), str(gr), int(pw))
