"""Extract 3GPP TS 38.212 LDPC base-graph shift tables into an .npz data file.

The tables (TS 38.212 Tables 5.3.2-2 and 5.3.2-3) are pure 3GPP standard
constants: for each edge (check node m, variable node n) of base graphs BG1
(46x68) and BG2 (42x52), a shift coefficient V_{m,n} for each of the 8
lifting-size sets.  We pull the numeric values out of the reference tree's
encoding of the standard tables (lib/phy/upper/channel_coding/ldpc/
ldpc_luts_impl.cpp) and re-store them as dense uint16 arrays of shape
(8, 46, 68) with 0xFFFF marking "no edge".  Rows/columns that the C++
aggregate initializer truncates are don't-care (outside the graph) and are
stored as "no edge".

Run once:  python tools/extract_ldpc_tables.py
Output:    srsran_project_tpu/ops/ldpc/_bg_tables.npz
"""

import re
import numpy as np

SRC = "/root/reference/lib/phy/upper/channel_coding/ldpc/ldpc_luts_impl.cpp"
OUT = "/root/repo/srsran_project_tpu/ops/ldpc/_bg_tables.npz"

NO_EDGE = 0xFFFF
M, N = 46, 68  # storage shape (BG2 occupies the top-left 42x52)
NOF_SETS = 8


def parse_braces(s, pos):
    """Parse a {...} group starting at s[pos] == '{'.

    Returns (tree, next_pos) where tree is a nested list of ints/strings.
    """
    assert s[pos] == "{"
    pos += 1
    items = []
    while True:
        m = re.match(r"[\s,]*", s[pos:])
        pos += m.end()
        c = s[pos]
        if c == "{":
            sub, pos = parse_braces(s, pos)
            items.append(sub)
        elif c == "}":
            return items, pos + 1
        else:
            m = re.match(r"NO_EDGE|\d+", s[pos:])
            assert m, s[pos : pos + 40]
            tok = m.group(0)
            items.append(NO_EDGE if tok == "NO_EDGE" else int(tok))
            pos += m.end()


def flatten_to_matrix(tree):
    """tree: nested list for one BG_matrix_t -> (46, 68) uint16 array."""
    # Unwrap single-element wrappers {{...}}.
    while len(tree) == 1 and isinstance(tree[0], list):
        tree = tree[0]
    out = np.full((M, N), NO_EDGE, dtype=np.uint16)
    assert len(tree) <= M, len(tree)
    for i, row in enumerate(tree):
        while len(row) == 1 and isinstance(row[0], list):
            row = row[0]
        assert len(row) <= N, len(row)
        for j, v in enumerate(row):
            assert isinstance(v, int)
            out[i, j] = v
    return out


def extract(text, start_marker, start_from):
    i = text.index(start_marker, start_from)
    i = text.index("{", i)
    text_nc = text  # comments already stripped by caller
    tree, _ = parse_braces(text_nc, i)
    # tree is the outer std::array init: possibly {{mat0, mat1, ...}}.
    while len(tree) == 1 and isinstance(tree[0], list) and len(tree[0]) == NOF_SETS:
        tree = tree[0]
    assert len(tree) == NOF_SETS, len(tree)
    return np.stack([flatten_to_matrix(t) for t in tree])


def main():
    text = open(SRC).read()
    text = re.sub(r"//.*", "", text)
    i1 = text.index("BG1_matrices")
    bg1 = extract(text, "BG1_matrices", 0)
    bg2 = extract(text, "BG2_matrices", i1 + 1)

    e1 = (bg1[0] != NO_EDGE).sum()
    e2 = (bg2[0] != NO_EDGE).sum()
    assert e1 == 316, e1
    assert e2 == 197, e2
    for s in range(NOF_SETS):
        assert ((bg1[s] != NO_EDGE) == (bg1[0] != NO_EDGE)).all()
        assert ((bg2[s] != NO_EDGE) == (bg2[0] != NO_EDGE)).all()
    assert (bg2[:, 42:, :] == NO_EDGE).all()
    assert (bg2[:, :, 52:] == NO_EDGE).all()
    # All shifts < 384.
    assert bg1[bg1 != NO_EDGE].max() < 384
    assert bg2[bg2 != NO_EDGE].max() < 384
    np.savez_compressed(OUT, bg1=bg1, bg2=bg2)
    print(f"wrote {OUT}: BG1 {e1} edges, BG2 {e2} edges")


if __name__ == "__main__":
    main()
