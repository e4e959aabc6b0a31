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
