"""Transceiver control plane (`[U:trx_manager.c]`/`[U:bands.c]` parity):
VFO/split/RIT/XIT arithmetic, band-plan recall + band memory, PTT routing,
S-meter calibration."""

import numpy as np
import pytest

from radioframe.api.bands import BAND_PLAN, BandMemory, band, band_of
from radioframe.api.transceiver import Transceiver, s_meter
from radioframe.core.config import RxConfig, TxConfig


def _trx(C=2):
    return Transceiver(RxConfig(channels=C), TxConfig(channels=C))


class TestBands:
    def test_plan_sane(self):
        for b in BAND_PLAN:
            assert b.lo_hz < b.default_hz < b.hi_hz
        assert band("40m").lo_hz == 7_000_000.0
        assert band_of(14_200_000.0).name == "20m"
        assert band_of(13_000_000.0) is None

    def test_memory_roundtrip(self):
        m = BandMemory()
        assert m.recall("20m") == (14_200_000.0, "ssb")  # plan default
        m.store(14_075_000.0, "cw")
        assert m.recall("20m") == (14_075_000.0, "cw")
        m2 = BandMemory.from_dict(m.to_dict())
        assert m2.recall("20m") == (14_075_000.0, "cw")


class TestTransceiverControl:
    def test_vfo_split_rit_xit(self):
        t = _trx()
        t.tune(0, 7_100_000.0)
        t.vfo_b(0, 7_150_000.0)
        assert t.rx_frequency(0) == 7_100_000.0
        assert t.tx_frequency(0) == 7_100_000.0  # no split: TX on VFO A
        t.split(0, True)
        assert t.tx_frequency(0) == 7_150_000.0
        t.rit(0, -200.0)
        t.xit(0, 50.0)
        assert t.rx_frequency(0) == 7_099_800.0
        assert t.tx_frequency(0) == 7_150_050.0
        t.split(0, False)
        t.swap_vfo(0)
        assert t.rx_frequency(0) == 7_150_000.0 - 200.0

    def test_band_switch_recalls_memory(self):
        t = _trx()
        t.set_band(0, "40m")
        assert t.rx_frequency(0) == band("40m").default_hz
        assert t.mode(0) == "lsb"
        t.tune(0, 7_030_000.0)
        t.set_mode(0, "cw")
        t.set_band(0, "20m")  # stores 40m spot on the way out
        assert t.mode(0) == "ssb"
        t.set_band(0, "40m")
        assert t.rx_frequency(0) == 7_030_000.0
        assert t.mode(0) == "cw"

    def test_s_meter_calibration(self):
        assert s_meter(10 ** (-73 / 10.0)) == "S9"       # IARU S9 = -73 dBm
        assert s_meter(10 ** (-93 / 10.0)) == "S6"       # 6 dB per S-unit
        assert s_meter(10 ** (-53 / 10.0)) == "S9+20"
        assert s_meter(0.0) == "S0"


class TestTransceiverDataPlane:
    @pytest.fixture(scope="class")
    def trx(self):
        return _trx()

    def test_ptt_routing(self, trx):
        rng = np.random.default_rng(0)
        T = 4 * trx.chain.rx.min_block
        Ta = 2 * trx.chain.tx.min_block
        iq = (rng.standard_normal((2, T)) + 1j * rng.standard_normal((2, T))).astype(np.complex64)
        mic = rng.standard_normal((2, Ta)).astype(np.float32) * 0.3
        trx.set_mode(0, "ssb")
        trx.set_mode(1, "ssb")
        trx.ptt(False)
        audio, tx_iq = trx.process(iq, mic)
        assert np.any(audio != 0.0)
        assert not np.any(tx_iq != 0.0)
        trx.ptt(True)
        assert trx.transmitting
        audio, tx_iq = trx.process(iq, mic)
        assert not np.any(audio != 0.0)
        assert np.any(tx_iq != 0.0)
        assert trx.s_meter(0).startswith("S")
