"""E2 agent / E2SM-KPM simulator tests: setup, subscription, periodic
indications fed from live scheduler metrics, RC control actions."""

import numpy as np

from srsran_project_tpu.l2sim.scheduler import RoundRobinScheduler, SchedulerConfig
from srsran_project_tpu.l3 import e2_sim


def build():
    ric = e2_sim.RicSim()
    agent = e2_sim.E2Agent(gnb_id=411, send_to_ric=ric.rx)
    ric.agent_tx = agent.rx
    return ric, agent


def test_setup_and_subscription_flow():
    ric, agent = build()
    agent.kpm.register("DRB.UEThpDl", lambda: 42.0)
    agent.kpm.register("RRU.PrbTotDl", lambda: 52.0)
    agent.start()
    assert agent.ready and ric.setup_seen.gnb_id == 411
    ric.subscribe(req_id=1, period=10, measurements=["DRB.UEThpDl", "Bogus.Metric"])
    resp = ric.sub_responses[0]
    assert resp.admitted == ["DRB.UEThpDl"] and resp.not_admitted == ["Bogus.Metric"]
    for slot in range(35):
        agent.tick(slot)
    assert len(ric.indications) == 3  # slots 10, 20, 30
    assert ric.indications[0].records == {"DRB.UEThpDl": 42.0}
    assert [i.sequence for i in ric.indications] == [1, 2, 3]


def test_kpm_reports_live_scheduler_metrics():
    ric, agent = build()
    sched = RoundRobinScheduler(SchedulerConfig(nof_rb=24, max_ues_per_slot=2))
    sched.add_ue(0x10, mcs=8)
    sched.add_ue(0x11, mcs=12)
    agent.kpm.register("DRB.UEThpUl",
                       lambda: sum(u.ul_bits_ok for u in sched.ues.values()))
    agent.kpm.register("RRU.PrbTotDl", lambda: 24.0)
    agent.start()
    ric.subscribe(req_id=7, period=5, measurements=["DRB.UEThpUl", "RRU.PrbTotDl"])
    # simulate some acked traffic
    for u in sched.ues.values():
        u.ul_bits_ok = 1000
    agent.tick(5)
    assert ric.indications[-1].records["DRB.UEThpUl"] == 2000.0


def test_rc_control_action_round_trip():
    ric, agent = build()
    agent.start()
    applied = {}

    def set_mcs(params):
        applied.update(params)
        return f"mcs={params['mcs']}"

    agent.register_rc_action("set_max_mcs", set_mcs)
    ric.control(req_id=3, action="set_max_mcs", params={"rnti": 0x10, "mcs": 15})
    assert applied == {"rnti": 0x10, "mcs": 15}
    assert ric.control_acks[0].success and ric.control_acks[0].detail == "mcs=15"
    ric.control(req_id=4, action="unknown", params={})
    assert not ric.control_acks[1].success


def test_ccc_cell_configuration_applies_rrm_policy():
    """E2SM-CCC style 2 (Cell Configuration and Control): an
    O-RRMPolicyRatio structure targeted at a slice's S-NSSAI updates the
    slice scheduler's ratios and returns an accepted outcome (reference
    e2sm_ccc_control_action_du_executor semantics)."""
    from srsran_project_tpu.l2sim.slicing import SliceConfig, SliceScheduler

    ric, agent = build()
    sched = SliceScheduler(SchedulerConfig(nof_rb=52, max_ues_per_slot=2), [
        SliceConfig(slice_id=1, min_ratio=0.2, max_ratio=1.0, sst=1, sd=0),
        SliceConfig(slice_id=2, min_ratio=0.1, max_ratio=0.5, sst=2, sd=7),
    ])
    agent.register_ccc(e2_sim.CccConfigExecutor(
        apply_policy=lambda nr_cgi, pol: sched.apply_rrm_policy(pol)))
    agent.start()
    assert any(f["id"] == e2_sim.RAN_FUNC_CCC for f in ric.setup_seen.ran_functions)

    ric.ccc_control(req_id=9, cells=[{
        "nr_cgi": 0x19B0,
        "cfg_structures": [{
            "name": "O-RRMPolicyRatio",
            "old": {"min_ratio": 10, "max_ratio": 50},
            "new": {"resource_type": "prb", "members": [{"plmn": "00101", "sst": 2, "sd": 7}],
                    "min_ratio": 30, "max_ratio": 80, "dedicated_ratio": 10},
        }],
    }])
    ack = ric.control_acks[-1]
    assert ack.success
    cell = ack.outcome["cells"][0]
    assert cell["nr_cgi"] == 0x19B0
    assert len(cell["accepted"]) == 1 and not cell["failed"]
    assert cell["accepted"][0]["current"]["min_ratio"] == 30
    assert sched.slices[2].min_ratio == 0.30 and sched.slices[2].max_ratio == 0.80
    assert sched.slices[1].min_ratio == 0.20  # untouched


def test_ccc_rejects_invalid_structures():
    from srsran_project_tpu.l2sim.slicing import SliceConfig, SliceScheduler

    ric, agent = build()
    sched = SliceScheduler(SchedulerConfig(nof_rb=24, max_ues_per_slot=1),
                           [SliceConfig(slice_id=1, sst=1, sd=0)])
    agent.register_ccc(e2_sim.CccConfigExecutor(
        apply_policy=lambda nr_cgi, pol: sched.apply_rrm_policy(pol)))
    agent.start()

    # min > max is invalid; unknown S-NSSAI is rejected by the DU.
    ric.ccc_control(req_id=10, cells=[{
        "nr_cgi": 1,
        "cfg_structures": [
            {"name": "O-RRMPolicyRatio",
             "new": {"members": [{"sst": 1, "sd": 0}], "min_ratio": 90, "max_ratio": 20}},
            {"name": "O-RRMPolicyRatio",
             "new": {"members": [{"sst": 9, "sd": 9}], "min_ratio": 10, "max_ratio": 20}},
        ],
    }])
    ack = ric.control_acks[-1]
    assert not ack.success
    cell = ack.outcome["cells"][0]
    assert len(cell["failed"]) == 2 and not cell["accepted"]
    assert cell["failed"][0]["cause"] == "ratio out of range"
    assert cell["failed"][1]["cause"] == "rejected by DU"
    # Unsupported style.
    ric.ccc_control(req_id=11, cells=[], style=1)
    assert not ric.control_acks[-1].success
