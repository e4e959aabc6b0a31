"""Bit-exact conformance of the coding stack against reference-generated
golden vectors (tools/refgen, compiled from /root/reference lib/phy/upper/
channel_coding).  Integer-domain suites must match bit for bit."""

import numpy as np
import pytest

from srsran_project_tpu.ops import crc as crc_mod
from srsran_project_tpu.ops import scrambling
from srsran_project_tpu.ops.ldpc import encoder as ldpc_encoder
from srsran_project_tpu.ops.ldpc import graphs as ldpc_graphs
from srsran_project_tpu.ops.ldpc import rate_match as ldpc_rm
from srsran_project_tpu.ops.ldpc import segmenter as ldpc_seg
from srsran_project_tpu.support.file_vector import read_vector

from conftest import load_suite, suite_path

pytestmark = pytest.mark.vectortest


# ----------------------------------------------------------------- crc ----


def _bits_from_bytes(data: np.ndarray) -> np.ndarray:
    return np.unpackbits(data.astype(np.uint8))


def test_crc_golden():
    cases = load_suite("crc")
    assert len(cases) >= 80
    for case in cases:
        msg = read_vector(suite_path("crc", case["msg"]), "u8")
        bits = _bits_from_bytes(msg) if case["mode"] == "byte" else msg
        got_bits = crc_mod.crc_ref(bits, case["poly"])
        got = int("".join(map(str, got_bits)), 2)
        assert got == case["crc"], f"CRC{case['poly']} len={case['len']} mode={case['mode']}"


def test_crc_jax_golden():
    import jax.numpy as jnp

    cases = load_suite("crc")
    for case in cases[::7]:  # jit-compiled path on a subsample (one per shape family)
        msg = read_vector(suite_path("crc", case["msg"]), "u8")
        bits = _bits_from_bytes(msg) if case["mode"] == "byte" else msg
        got_bits = np.asarray(crc_mod.crc(jnp.asarray(bits), case["poly"]))
        got = int("".join(map(str, got_bits)), 2)
        assert got == case["crc"]


# ------------------------------------------------------------ scrambler ----


def test_scrambler_golden():
    cases = load_suite("scrambler")
    for case in cases:
        seq = read_vector(suite_path("scrambler", case["seq"]), "u8")
        off, L = case["offset"], case["len"]
        # c(n+off) is the same Gold sequence sliced at off.
        got = scrambling.gold_ref(case["c_init"], off + L)[off:]
        np.testing.assert_array_equal(got, seq, err_msg=f"c_init={case['c_init']} off={off}")


def test_scrambler_jax_golden():
    import jax.numpy as jnp

    cases = load_suite("scrambler")
    for case in cases[:8]:
        seq = read_vector(suite_path("scrambler", case["seq"]), "u8")
        off, L = case["offset"], case["len"]
        got = np.asarray(scrambling.gold_sequence(jnp.uint32(case["c_init"]), off + L))[off:]
        np.testing.assert_array_equal(got, seq)


# --------------------------------------------------------- ldpc encoder ----


def test_ldpc_encoder_golden():
    import jax.numpy as jnp

    cases = load_suite("ldpc_encoder")
    assert len(cases) == 102  # 2 BGs x 51 lifting sizes
    for case in cases:
        msg = read_vector(suite_path("ldpc_encoder", case["input"]), "u8")
        ref_cw = read_vector(suite_path("ldpc_encoder", case["output"]), "u8")
        got = np.asarray(
            ldpc_encoder.encode_to_buffer(jnp.asarray(msg)[None], case["bg"], case["ls"])
        )[0]
        assert got.shape[0] == case["out_len"]
        np.testing.assert_array_equal(got, ref_cw, err_msg=f"bg={case['bg']} ls={case['ls']}")


# ------------------------------------------------------ ldpc rate matcher ----


def test_ldpc_rate_matcher_golden():
    import jax.numpy as jnp

    cases = load_suite("ldpc_rate_matcher")
    for case in cases:
        bg, z = case["bg"], case["ls"]
        msg = read_vector(suite_path("ldpc_rate_matcher", case["input"]), "u8")
        ref_out = read_vector(suite_path("ldpc_rate_matcher", case["output"]), "u8")
        k = msg.shape[0]
        k_prime = k - case["filler"]
        n_cb = case["nref"] if case["nref"] else None
        buf = ldpc_encoder.encode_to_buffer(jnp.asarray(msg)[None], bg, z)
        got = np.asarray(
            ldpc_rm.rate_match(buf, bg, z, k_prime, case["e"], case["rv"], case["qm"], n_cb)
        )[0]
        np.testing.assert_array_equal(
            got,
            ref_out,
            err_msg=f"bg={bg} z={z} rv={case['rv']} qm={case['qm']} e={case['e']} "
            f"nref={case['nref']} filler={case['filler']}",
        )


# ---------------------------------------------------- ldpc rate dematcher ----


def test_ldpc_rate_dematcher_golden():
    import jax.numpy as jnp

    cases = load_suite("ldpc_rate_dematcher")
    for case in cases:
        bg, z, qm, e = case["bg"], case["ls"], case["qm"], case["e"]
        k = (22 if bg == 1 else 10) * z
        k_prime = k - case["filler"]
        in0 = read_vector(suite_path("ldpc_rate_dematcher", case["in0"]), "i8")
        out0 = read_vector(suite_path("ldpc_rate_dematcher", case["out0"]), "i8")
        got0 = np.asarray(
            ldpc_rm.rate_dematch(jnp.asarray(in0)[None], bg, z, k_prime, e, case["rv0"], qm)
        )[0]
        np.testing.assert_array_equal(
            got0, out0, err_msg=f"tx0 bg={bg} z={z} rv={case['rv0']} filler={case['filler']}"
        )
        # HARQ: second transmission at rv1 combined into the buffer.
        in1 = read_vector(suite_path("ldpc_rate_dematcher", case["in1"]), "i8")
        out1 = read_vector(suite_path("ldpc_rate_dematcher", case["out1"]), "i8")
        got1 = np.asarray(
            ldpc_rm.rate_dematch_combine(
                jnp.asarray(got0)[None], jnp.asarray(in1)[None], bg, z, k_prime, e, case["rv1"], qm
            )
        )[0]
        np.testing.assert_array_equal(
            got1, out1, err_msg=f"tx1 bg={bg} z={z} rv={case['rv1']} filler={case['filler']}"
        )


# -------------------------------------------------------- ldpc segmenter ----


def test_ldpc_segmenter_golden():
    import jax.numpy as jnp

    cases = load_suite("ldpc_segmenter")
    by_tb = {}
    for case in cases:
        by_tb.setdefault(case["tb"], []).append(case)
    for tb_file, tb_cases in by_tb.items():
        first = tb_cases[0]
        tb = read_vector(suite_path("ldpc_segmenter", tb_file), "u8")
        tb_bits = np.unpackbits(tb)
        params = ldpc_seg.compute_segment_params_bg(
            tbs=tb_bits.shape[0], base_graph=first["bg"]
        )
        assert params.nof_codeblocks == first["nof_cb"], tb_file
        assert params.lifting_size == first["ls"], tb_file
        segs = np.asarray(ldpc_seg.segment_tx(jnp.asarray(tb_bits)[None], params))[0]
        for case in tb_cases:
            ref_cb = read_vector(suite_path("ldpc_segmenter", case["cb_data"]), "u8")
            assert case["seg_len"] == params.nof_cb_bits
            got = segs[case["cb_index"]]
            # The reference leaves filler positions marked (FILLER_BIT=254);
            # we zero-fill.  Compare payload+CRC, and check ref filler markers.
            kp = params.nof_payload_bits_per_cb
            np.testing.assert_array_equal(
                got[:kp], ref_cb[:kp], err_msg=f"{tb_file} cb={case['cb_index']}"
            )
            assert case["filler"] == params.nof_filler_bits
            # Reference rm_length drives the rate matcher; cross-check ours.
            assert case["rm_length"] == ldpc_seg.rate_matched_length(
                params, case["cb_index"], first["qm"], first["layers"], first["ch_symbols"]
            ), f"{tb_file} cb={case['cb_index']}"
