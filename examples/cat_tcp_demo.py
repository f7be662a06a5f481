"""CAT-over-TCP demo (`[U:usbd_*]`/`[U:cat.c]` analog, SURVEY.md §3.5).

Starts a Kenwood-dialect CAT server on a TCP socket while a duplex stream
processes synthetic IQ blocks, then drives it the way a rig-control client
(hamlib / wsjtx) would: query identity, retune, change mode, key PTT —
all mid-stream, no recompile.

Run: python examples/cat_tcp_demo.py
"""

import socket
import threading
import time

import numpy as np

from radioframe.api.cat import CatServer
from radioframe.api.cat_tcp import CatTcpServer
from radioframe.api.transceiver import Transceiver
from radioframe.core.config import RxConfig, TxConfig


def main():
    trx = Transceiver(RxConfig(channels=1), TxConfig(channels=1))
    chain = trx.chain.rx
    B, fs = chain.min_block, trx.rx_cfg.fs_in
    stop = threading.Event()

    def stream():
        rng = np.random.default_rng(0)
        n = 0
        while not stop.is_set():
            t = (np.arange(B) + n * B) / fs
            iq = (0.3 * np.exp(2j * np.pi * 39_500.0 * t)
                  + 0.01 * (rng.standard_normal(B) + 1j * rng.standard_normal(B)))
            audio, _ = trx.process(iq.astype(np.complex64)[None, :],
                                   np.zeros(B // trx.rx_cfg.decim, np.float32))
            n += 1
            if n % 20 == 0:
                print(f"  [stream] block {n}: rms={np.sqrt(np.mean(audio**2)):.4f} "
                      f"{trx.s_meter(0)}")

    with CatTcpServer(CatServer(trx)) as srv:
        print(f"CAT server listening on {srv.host}:{srv.port}")
        th = threading.Thread(target=stream, daemon=True)
        th.start()
        cli = socket.create_connection((srv.host, srv.port), timeout=5)
        cli.settimeout(5)

        def ask(cmd):
            cli.sendall(cmd.encode())
            if cmd.rstrip(";") not in ("TX", "RX"):  # those answer nothing
                resp = cli.recv(4096).decode()
                print(f"  client> {cmd!r:24} server> {resp!r}")
            else:
                print(f"  client> {cmd!r}")

        ask("ID;")
        ask("FA00000038500;MD2;IF;")   # tune onto the tone, USB
        time.sleep(0.5)
        ask("SM;")                      # S-meter after AGC settles
        ask("TX;")                      # key PTT
        time.sleep(0.3)
        ask("IF;")                      # status shows TX
        ask("RX;")
        stop.set()
        # join WITHOUT a timeout: the loop exits after its current block,
        # but one block step can exceed any fixed timeout on a loaded
        # host — exiting the interpreter while the thread is mid-jax-call
        # aborts in native teardown (caught by the examples drift guard
        # under a full parallel --runslow load)
        th.join()
        cli.close()
    print("done — retune/mode/PTT all happened mid-stream, zero recompiles:",
          trx._step._cache_size() == 1)


if __name__ == "__main__":
    main()
