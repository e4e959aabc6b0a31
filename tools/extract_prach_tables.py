"""Extract the 3GPP PRACH standard constant tables into an .npz.

Sources (standard 3GPP tables, TS 38.211):
- Table 6.3.3.1-3/4: logical -> physical root sequence mapping (long/short),
  parsed from the reference's prach_generator_impl.cpp LUTs.
- Tables 6.3.3.1-5/6/7: N_cs per zeroCorrelationZone for 1.25/5/15+ kHz RA
  subcarrier spacings and restricted sets, parsed from
  lib/ran/prach/prach_cyclic_shifts.cpp.

These are published spec constants (same treatment as the LDPC lifting
tables in tools/extract_ldpc_tables.py); only the numbers are taken, no
code.  Output: srsran_project_tpu/phy/_prach_tables.npz
"""

import os
import re

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "srsran_project_tpu", "phy", "_prach_tables.npz")


def _numbers_in_braces(text: str, anchor: str) -> list[int]:
    """All integers inside the brace block following `anchor`."""
    i = text.index(anchor)
    start = text.index("{", i)
    depth = 0
    for j in range(start, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                block = text[start : j + 1]
                return [int(t) for t in re.findall(r"\d+", block)]
    raise ValueError(anchor)


def main() -> None:
    gen = open(f"{REF}/lib/phy/upper/channel_processors/prach_generator_impl.cpp").read()
    # Long table appears inside get_sequence_number_long.
    i_long = gen.index("get_sequence_number_long")
    long_lut = _numbers_in_braces(gen[i_long:], "lut = ")
    assert len(long_lut) == 838, len(long_lut)
    i_short = gen.index("get_sequence_number_short")
    short_lut = _numbers_in_braces(gen[i_short:], "lut = ")
    assert len(short_lut) == 138, len(short_lut)

    cyc = open(f"{REF}/lib/ran/prach/prach_cyclic_shifts.cpp").read()
    reserved = 430  # PRACH_CYCLIC_SHIFTS_RESERVED marker value used below
    cyc = cyc.replace("PRACH_CYCLIC_SHIFTS_RESERVED", str(reserved))

    def ncs(anchor):
        v = _numbers_in_braces(cyc, anchor)
        assert len(v) == 16, (anchor, len(v))
        return np.array(v, np.int32)

    tables = {
        "long_root_map": np.array(long_lut, np.int32),
        "short_root_map": np.array(short_lut, np.int32),
        "ncs_1_25_unrestricted": ncs("NOF_CYCLIC_SHIFTS_1_25_UNRESTRICTED = "),
        "ncs_1_25_type_a": ncs("NOF_CYCLIC_SHIFTS_1_25_TYPE_A = "),
        "ncs_1_25_type_b": ncs("NOF_CYCLIC_SHIFTS_1_25_TYPE_B = "),
        "ncs_5_unrestricted": ncs("NOF_CYCLIC_SHIFTS_5_UNRESTRICTED = "),
        "ncs_5_type_a": ncs("NOF_CYCLIC_SHIFTS_5_TYPE_A = "),
        "ncs_5_type_b": ncs("NOF_CYCLIC_SHIFTS_5_TYPE_B = "),
        "ncs_short_unrestricted": ncs("NOF_CYCLIC_SHIFTS_OTHER_UNRESTRICTED = "),
        "ncs_reserved_marker": np.array([reserved], np.int32),
    }
    np.savez(OUT, **tables)
    print(f"wrote {OUT}: " + ", ".join(f"{k}[{v.size}]" for k, v in tables.items()))





def extract_thresholds() -> None:
    """Parse the validated per-(ports, scs, format, zcz, combine) detection
    threshold/margin table (prach_detector_generic_thresholds.cpp) into
    srsran_project_tpu/phy/_prach_thresholds.npz."""
    import numpy as np

    src = open(
        f"{REF}/lib/phy/upper/channel_processors/prach_detector_generic_thresholds.cpp"
    ).read()
    pat = re.compile(
        r"\{\{\s*/\* nof_rx_ports \*/\s*(\d+),\s*prach_subcarrier_spacing::(\w+),\s*"
        r"prach_format_type::(\w+),\s*/\* ZCZ \*/\s*(\d+),\s*/\* combine symbols \*/\s*(\w+)\},\s*"
        r"\{([0-9.]+)F,\s*(\d+)\},\s*th_flag::(\w+)\}"
    )
    scs_map = {"kHz1_25": 0, "kHz5": 1, "kHz15": 2, "kHz30": 3, "kHz60": 4, "kHz120": 5}
    fmt_map = {"zero": 0, "one": 1, "two": 2, "three": 3,
               "A1": 10, "A2": 11, "A3": 12, "B1": 13, "B4": 16,
               "A1_B1": 20, "A2_B2": 21, "A3_B3": 22, "C0": 30, "C2": 31}
    flag_map = {"red": 0, "orange": 1, "green": 2}
    rows = []
    for m in pat.finditer(src):
        ports, scs, fmt, zcz, combine, thr, margin, flag = m.groups()
        if fmt not in fmt_map or scs not in scs_map:
            raise ValueError(f"unmapped enum {fmt}/{scs}")
        rows.append((int(ports), scs_map[scs], fmt_map[fmt], int(zcz),
                     1 if combine == "true" else 0, float(thr), int(margin),
                     flag_map[flag]))
    assert len(rows) > 300, len(rows)
    out = os.path.join(os.path.dirname(OUT), "_prach_thresholds.npz")
    np.savez(out, table=np.array(rows, np.float64),
             columns=np.array(["ports", "scs", "format", "zcz", "combine",
                               "threshold", "margin", "flag"]))
    print(f"wrote {out}: {len(rows)} threshold entries")


if __name__ == "__main__":
    main()
    extract_thresholds()
