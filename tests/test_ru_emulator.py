"""RU-emulator loop: baseband IQ travels over the native UDP transport
(the simulated-RF boundary) and decodes end-to-end.

Mirrors the reference's ZMQ-radio + ru_emulator hardware-free path
(lib/radio/zmq + apps/examples/ofh/ru_emulator.cpp): the 'RU' side sends
one slot of samples per port as Q15 IQ frames; the 'DU' side reassembles,
OFDM-demodulates, and PUSCH-decodes.
"""

import numpy as np
import pytest

from srsran_project_tpu.ops import ofdm
from srsran_project_tpu.ops.modulation import Modulation
from srsran_project_tpu.phy import pdsch, pusch
from srsran_project_tpu.phy.allocation import Allocation
from srsran_project_tpu.ran.constants import CyclicPrefix, SubcarrierSpacing
from srsran_project_tpu.support import native


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_ru_emulator_slot_over_udp():
    alloc = Allocation(rb_start=0, rb_count=24, sym_start=1, sym_count=12, dmrs_symbols=(2,))
    common = dict(tbs=1000, target_code_rate=0.3, modulation=Modulation.QPSK, alloc=alloc,
                  nof_layers=1, nof_grid_symbols=14, nof_grid_sc=288)
    txc = pdsch.PdschConfig(nof_ports=1, **common)
    rxc = pusch.PuschConfig(nof_rx_ports=1, **common)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, size=(1000,), dtype=np.uint8)
    rnti = np.uint32(0x900D)
    grid = pdsch.process(tb, rnti, np.eye(1, dtype=np.complex64), txc)
    iq = np.asarray(
        ofdm.modulate_slot(grid, SubcarrierSpacing.KHZ30, 512, CyclicPrefix.NORMAL, 0)
    )[0]
    # Keep within Q15 range on the wire.
    scale = 0.5 / np.abs(iq).max()
    iq_tx = (iq * scale).astype(np.complex64)

    rx = native.IqSocket.rx(47555)
    tx = native.IqSocket.tx(47555)
    tx.send(slot=3, symbol=0, port_id=0, iq=iq_tx)

    chunks = []
    while sum(c.size for c in chunks) < iq_tx.size:
        r = rx.recv(max_samples=8192, timeout_ms=1000)
        assert r is not None, "transport timeout"
        slot_id, sym, port, data = r
        assert (slot_id, port) == (3, 0)
        chunks.append(data)
    tx.close()
    rx.close()

    samples = np.concatenate(chunks)[: iq_tx.size] / scale
    back = ofdm.demodulate_slot(
        samples[None].astype(np.complex64), 24, SubcarrierSpacing.KHZ30, 512, CyclicPrefix.NORMAL, 0
    )
    out = pusch.process(np.asarray(back).astype(np.complex64), rnti, rxc)
    assert bool(np.asarray(out["tb_crc_ok"]))
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
