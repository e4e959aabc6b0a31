#!/usr/bin/env python3
"""DU-high slot-handling benchmark: scheduler + MAC assembly latency.

Counterpart of the reference's tests/benchmarks/du_high/du_high_benchmark.cpp
(SURVEY.md section 6): measures pure L2 slot handling — scheduler policy run,
DL TB assembly from RLC queues, UL TB decode back through RLC — per UE count,
no PHY in the loop.  Prints one JSON line per configuration.

Usage: python benchmarks/du_high_benchmark.py [--slots 200] [--ues 1 4 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from srsran_project_tpu.l2 import du_high_sim, rlc  # noqa: E402
from srsran_project_tpu.l2sim.scheduler import SchedulerConfig  # noqa: E402
from srsran_project_tpu.ran.constants import SubcarrierSpacing  # noqa: E402
from srsran_project_tpu.ran.slot_point import SlotPoint  # noqa: E402


def run(nof_ues: int, nof_slots: int) -> dict:
    du = du_high_sim.DuHighSim(SchedulerConfig(nof_rb=273, max_ues_per_slot=min(4, nof_ues)))
    peers = {}
    for i in range(nof_ues):
        rnti = 0x100 + i
        du.add_ue(rnti, mcs=15)
        peers[rnti] = rlc.RlcAmEntity()
        # keep the DL queues loaded
        for _ in range(4):
            du.ues[rnti].bearers[4].entity.tx_sdu(bytes(1400))
    du.scheduler.tb_source = du.build_dl_tb
    rng = np.random.default_rng(0)

    lat = []
    for k in range(nof_slots):
        slot = SlotPoint.from_sfn_slot(SubcarrierSpacing.KHZ30, k // 20, k % 20)
        t0 = time.perf_counter_ns()
        dl, tx, ul, grants = du.scheduler.run_slot(slot, rng)
        # UL leg: peers echo a PDU-laden TB back through MAC decode
        for rnti, harq_id, tbs in grants:
            peer = peers[rnti]
            peer.tx_sdu(bytes(min(1400, tbs // 8 - 16)))
            pdu = peer.pull_pdu(tbs // 8 - 8)
            if pdu is not None:
                from srsran_project_tpu.l2 import mac_pdu
                tb = mac_pdu.encode_mac_pdu([mac_pdu.MacSubPdu(4, pdu)],
                                            tb_size=tbs // 8, uplink=True)
                du.handle_ul_tb(rnti, du_high_sim.bytes_to_bits(tb, tbs))
        lat.append(time.perf_counter_ns() - t0)
        for rnti in peers:  # refill DL queues
            du.ues[rnti].bearers[4].entity.tx_sdu(bytes(1400))
    lat_us = np.asarray(lat) / 1e3
    return {
        "metric": f"du_high_slot_latency_{nof_ues}ue",
        "value": round(float(np.percentile(lat_us, 50)), 1),
        "unit": "us",
        "p99_us": round(float(np.percentile(lat_us, 99)), 1),
        "mean_us": round(float(lat_us.mean()), 1),
        "dl_mbytes": round(du.dl_bytes / 1e6, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slots", type=int, default=200)
    ap.add_argument("--ues", type=int, nargs="+", default=[1, 4, 16])
    args = ap.parse_args()
    for n in args.ues:
        print(json.dumps(run(n, args.slots)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
