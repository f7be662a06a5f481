"""CAT over TCP (`[U:usbd_*]` CDC transport analog, VERDICT r2 ask #6):
socket framing (partial frames, multiple clients) and a LIVE loop — a CAT
client retunes/modes/keys the transceiver over the socket while a
CaptureSource-fed duplex stream is processing blocks concurrently, and the
stream follows without any recompile (frequencies are runtime inputs,
SURVEY.md §3.4)."""

import socket
import threading
import time

import numpy as np
import pytest

from radioframe.api.cat import CatServer
from radioframe.api.cat_tcp import CatTcpServer
from radioframe.api.transceiver import Transceiver
from radioframe.core.config import RxConfig, TxConfig
from radioframe.core.stream import CaptureSource


def _client(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=5.0)
    s.settimeout(5.0)
    return s


def _ask(sock, cmd: str) -> str:
    sock.sendall(cmd.encode())
    return sock.recv(4096).decode()


class TestTransport:
    @pytest.fixture
    def srv(self):
        trx = Transceiver(RxConfig(channels=2), TxConfig(channels=2))
        with CatTcpServer(CatServer(trx)) as srv:
            yield srv

    def test_roundtrip(self, srv):
        s = _client(srv.port)
        assert _ask(s, "FA00007100000;FA;") == "FA00007100000;"
        s.close()

    def test_partial_frames_across_packets(self, srv):
        # a frame split across TCP packets must not dispatch early
        s = _client(srv.port)
        s.sendall(b"FA000071")
        time.sleep(0.05)
        s.sendall(b"00000;FA;")
        assert s.recv(4096) == b"FA00007100000;"
        s.close()

    def test_unknown_command(self, srv):
        s = _client(srv.port)
        assert _ask(s, "ZZ;") == "?;"
        s.close()

    def test_two_clients(self, srv):
        a, b = _client(srv.port), _client(srv.port)
        _ask(a, "FA00014200000;FA;")
        assert _ask(b, "FA;") == "FA00014200000;"
        a.close(), b.close()


class TestLiveLoop:
    def test_cat_drives_running_stream(self):
        """Tone at +40 kHz; stream starts detuned (silent), a CAT client
        retunes mid-stream (audio appears), keys PTT (audio mutes), unkeys
        (audio returns) — all without recompiling the duplex step."""
        C = 1
        rx_cfg = RxConfig(channels=C)
        trx = Transceiver(rx_cfg, TxConfig(channels=C))
        chain = trx.chain.rx
        B = chain.min_block  # 2048 input samples -> 512 audio samples
        fs = rx_cfg.fs_in
        tone_hz = 40_000.0

        stop = threading.Event()

        def producer():
            # interleaved int16 IQ chunks, one block per chunk, CW tone
            n = 0
            while not stop.is_set():
                t = (np.arange(B) + n * B) / fs
                iq = 8000.0 * np.exp(2j * np.pi * tone_hz * t)
                buf = np.empty(2 * B, np.int16)
                buf[0::2] = np.round(iq.real).astype(np.int16)
                buf[1::2] = np.round(iq.imag).astype(np.int16)
                n += 1
                yield buf

        src = CaptureSource(producer(), block_len=B, channels=C)
        mic = np.zeros(512, np.float32)
        log = []  # (block_idx, audio_rms)
        stream_err = []

        def stream_loop():
            try:
                for i, blk in enumerate(src):
                    audio, _tx = trx.process(blk, mic)
                    log.append(float(np.sqrt(np.mean(audio[0] ** 2))))
                    if stop.is_set():
                        return
            except Exception as e:  # pragma: no cover - surfaced below
                stream_err.append(e)

        def wait_blocks(n, timeout=30.0):
            t0 = time.monotonic()
            while len(log) < n:
                assert not stream_err, stream_err
                assert time.monotonic() - t0 < timeout, f"stream stalled at {len(log)}"
                time.sleep(0.01)
            return len(log)

        with CatTcpServer(CatServer(trx, channel=0)) as srv:
            th = threading.Thread(target=stream_loop, daemon=True)
            th.start()
            cli = _client(srv.port)
            try:
                # phase 1: detuned -> quiet (warm-up block 0 excluded)
                n1 = wait_blocks(4)
                # retune onto the tone (tone lands at +1 kHz, in the SSB
                # passband) and select SSB, mid-stream
                _ask(cli, "FA00000039000;MD2;FA;")
                sent_tune = len(log)
                n2 = wait_blocks(sent_tune + 6)
                # TX;/RX; have no response frame, so sending is NOT
                # synchronized with the server thread applying them — wait
                # for the state flip before recording the block index
                # (r4: a faster jitted Transceiver init widened this race)
                def wait_ptt(value, timeout=10.0):
                    t0 = time.monotonic()
                    while trx._ptt is not value:
                        assert time.monotonic() - t0 < timeout, "PTT cmd lost"
                        time.sleep(0.005)

                cli.sendall(b"TX;")  # key PTT
                wait_ptt(True)
                sent_tx = len(log)
                wait_blocks(sent_tx + 6)
                cli.sendall(b"RX;")
                wait_ptt(False)
                sent_rx = len(log)
                wait_blocks(sent_rx + 6)
            finally:
                stop.set()
                cli.close()
            th.join(timeout=10.0)
        assert not stream_err, stream_err

        rms = np.asarray(log)
        # phase 1 (skip block 0 = OLS warm-up): tone out of band -> quiet
        quiet = rms[1:n1]
        assert quiet.max() < 0.05, quiet
        # after retune: audio appears (AGC pulls it toward its 0.5 target)
        post_tune = rms[sent_tune + 1 : sent_tx]
        assert post_tune.max() > 0.1, post_tune
        # PTT keyed: rx audio hard-muted (exact zeros)
        ptt_zone = rms[sent_tx + 1 : sent_rx]
        assert ptt_zone.min() == 0.0, ptt_zone
        # unkeyed again: audio returns
        assert rms[sent_rx + 1 :].max() > 0.1, rms[sent_rx + 1 :]
        # the control plane never recompiled the data plane
        assert trx._step._cache_size() == 1
