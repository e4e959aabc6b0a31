"""Extract 3GPP security-algorithm S-box constants into an .npz data file.

The tables are pure standard constants published in the 3GPP/SAGE algorithm
specifications: SNOW 3G's SR (Rijndael S-box, UEA2/UIA2 spec section 5.1)
and SQ (Dickson-polynomial S-box, section 5.2), and ZUC's S0/S1 boxes and
the D key-loading constants (TS 35.222 section 3.4).  As with the LDPC
lifting tables (extract_ldpc_tables.py), we pull the numeric values out of
the reference tree's encoding of the standard tables and re-store them as
dense uint8/uint16 arrays; all algorithm code is written fresh.

Run once:  python tools/extract_security_tables.py
Output:    srsran_project_tpu/l2/_security_tables.npz
"""

import re

import numpy as np

S3G_H = "/root/reference/lib/security/s3g.h"
ZUC_CPP = "/root/reference/lib/security/zuc.cpp"
OUT = "/root/repo/srsran_project_tpu/l2/_security_tables.npz"


def extract_array(text: str, name: str, count: int) -> list[int]:
    m = re.search(rf"\b{name}\s*\[\s*\d*\s*\]\s*=\s*\{{", text)
    if not m:
        raise SystemExit(f"table {name} not found")
    depth = 1
    i = m.end()
    start = i
    while depth:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    body = text[start : i - 1]
    vals = [int(tok, 0) for tok in re.findall(r"0[xX][0-9a-fA-F]+|\d+", body)]
    if len(vals) != count:
        raise SystemExit(f"table {name}: expected {count} values, got {len(vals)}")
    return vals


def main() -> None:
    s3g = open(S3G_H).read()
    zuc = open(ZUC_CPP).read()
    np.savez(
        OUT,
        snow3g_sr=np.array(extract_array(s3g, "SR", 256), dtype=np.uint8),
        snow3g_sq=np.array(extract_array(s3g, "SQ", 256), dtype=np.uint8),
        zuc_s0=np.array(extract_array(zuc, "S0", 256), dtype=np.uint8),
        zuc_s1=np.array(extract_array(zuc, "S1", 256), dtype=np.uint8),
        zuc_d=np.array(extract_array(zuc, "EK_d", 16), dtype=np.uint16),
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
