"""Composable application units (reference apps/units layer): a gNB is a
composition of AMF / CU-CP / CU-UP-E1 / DU-F1 / DU-high units with
late-bound links; the attach choreography runs through the composed stack."""

from srsran_project_tpu import units
from srsran_project_tpu.l2 import security


def test_compose_gnb_and_attach():
    comp = units.compose_gnb()
    amf = comp.instances["amf"]
    cucp = comp.instances["cu_cp"]
    du = comp.instances["du_f1"]
    e1u = comp.units["cu_up_e1"]

    cucp.start(gnb_id=comp.config["gnb_id"], plmn=comp.config["plmn"],
               tac=comp.config["tac"])
    assert cucp.ng_ready
    du.setup(cells=[{"pci": 1, "nr_cgi": "00101-1", "dl_arfcn": 632628,
                     "bandwidth_rb": 273}])
    assert du.f1_ready

    from test_l3_attach import UeRrcAgent

    ue = UeRrcAgent(du, c_rnti=0x4601,
                    k_gnb_provider=lambda: security.kdf(
                        amf.k_amf, 0x6E, (1).to_bytes(4, "big")))
    ue.connect()
    assert ue.state == "connected"
    assert amf.sessions_done == [1]
    assert e1u.cu_ups and e1u.cu_ups[0].nea == 2

    # Unit surface: commands + metrics (reference application_unit hooks).
    cmds = comp.commands()
    assert "cu_cp.release_ue" in cmds
    met = comp.metrics()
    assert met["cu_cp"]["nof_ues"] == 1 and met["cu_cp"]["ng_ready"]
    cmds["cu_cp.release_ue"](1)
    assert ue.released


def test_missing_dependency_rejected():
    import pytest

    with pytest.raises(ValueError, match="requires"):
        units.Composer().add(units.CuCpUnit()).compose()
