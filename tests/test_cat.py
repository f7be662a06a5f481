"""CAT protocol adapter round-trips (`[U:cat.c]` analog, SURVEY.md §2.2 #21):
command parsing, the IF frame layout, FR idempotency, and the '?;' fallback
for unknown commands and malformed arguments."""

import numpy as np
import pytest

from radioframe.api.cat import CatServer
from radioframe.api.transceiver import Transceiver
from radioframe.core.config import RxConfig, TxConfig


@pytest.fixture(scope="module")
def trx():
    return Transceiver(RxConfig(channels=2), TxConfig(channels=2))


@pytest.fixture
def cat(trx):
    # reset the bits the tests touch (module-scoped trx avoids rebuild cost)
    trx._vfo_a[:] = 0.0
    trx._vfo_b[:] = 0.0
    trx._rit[:] = 0.0
    trx._split[:] = False
    trx._rx_vfo[:] = 0
    trx._modes[:] = 0
    trx.ptt(False)
    return CatServer(trx)


class TestFrequency:
    def test_fa_roundtrip(self, cat):
        assert cat.handle("FA00007100000;") == ""
        assert cat.handle("FA;") == "FA00007100000;"

    def test_fb_roundtrip(self, cat):
        cat.handle("FB00007105000;")
        assert cat.handle("FB;") == "FB00007105000;"

    def test_multiple_commands_one_buffer(self, cat):
        out = cat.handle("FA00014200000;FA;MD2;MD;")
        assert out == "FA00014200000;MD2;"


class TestMode:
    @pytest.mark.parametrize("digit,name", [("1", "lsb"), ("2", "ssb"),
                                            ("3", "cw"), ("4", "nfm"), ("5", "am")])
    def test_md_roundtrip(self, cat, digit, name):
        cat.handle(f"MD{digit};")
        assert cat.trx.mode(0) == name
        assert cat.handle("MD;") == f"MD{digit};"

    def test_md_bad_digit(self, cat):
        assert cat.handle("MD9;") == "?;"


class TestFrIdempotency:
    def test_fr1_is_absolute_not_a_swap(self, cat):
        """Rig software re-asserts FR1 on reconnect/poll — must not toggle."""
        cat.handle("FA00007100000;FB00007200000;")
        cat.handle("FR1;")
        assert cat.trx.rx_frequency(0) == 7_200_000.0
        cat.handle("FR1;")  # re-assert: still VFO B
        assert cat.trx.rx_frequency(0) == 7_200_000.0
        assert cat.handle("FR;") == "FR1;"
        cat.handle("FR0;")
        assert cat.trx.rx_frequency(0) == 7_100_000.0
        assert cat.handle("FR;") == "FR0;"

    def test_fr_reported_in_if_p10(self, cat):
        cat.handle("FA00007100000;FR1;")
        frame = cat.handle("IF;")
        assert frame.startswith("IF") and frame.endswith(";")
        assert frame[30] == "1"  # P10 receive VFO
        cat.handle("FR0;")
        assert cat.handle("IF;")[30] == "0"


class TestIfFrame:
    def test_layout(self, cat):
        cat.handle("FA00014074000;MD2;FT1;")
        frame = cat.handle("IF;")
        body = frame[2:-1]
        assert len(body) == 35  # TS-480 content length after 'IF'
        assert int(frame[2:13]) == 14_074_000  # P1
        assert frame[29] == "2"  # P9 mode = ssb
        assert frame[32] == "1"  # P12 split on


class TestRobustness:
    def test_unknown_command(self, cat):
        assert cat.handle("ZZ;") == "?;"

    @pytest.mark.parametrize("bad", ["FAxx;", "FB12a4;", "KSqq;", "AI?;"])
    def test_malformed_numeric_args_answer_query(self, cat, bad):
        assert cat.handle(bad) == "?;"
        # server still alive afterwards
        assert cat.handle("ID;") == "ID020;"

    def test_ptt_and_power(self, cat):
        cat.handle("TX;")
        assert cat.trx.transmitting
        cat.handle("RX;")
        assert not cat.trx.transmitting
        assert cat.handle("PS;") == "PS1;"

    def test_keyer_speed_clamped(self, cat):
        cat.handle("KS099;")
        assert cat.handle("KS;") == "KS060;"

    def test_sm_without_data(self, cat):
        cat.trx.last_aux = None
        assert cat.handle("SM0;") == "SM00000;"
