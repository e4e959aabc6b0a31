"""Polar code construction (TS 38.212 §5.3.1.2): code length, frozen set,
rate-matching mode.  Counterpart of the reference's polar_code_impl
(lib/phy/upper/channel_coding/polar/polar_code_impl.cpp); host-side NumPy.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

from . import tables


@dataclasses.dataclass(frozen=True)
class PolarCode:
    k: int  # info bits (incl. CRC)
    e: int  # rate-matched length
    n: int  # log2 N
    rm_mode: str  # "repetition" | "puncturing" | "shortening"
    info_set: tuple[int, ...]  # input positions carrying info bits, ascending
    # frozen = complement of info_set (no PC bits yet: n_pc = 0)

    @property
    def nval(self) -> int:
        return 1 << self.n


@functools.lru_cache(maxsize=None)
def construct(k: int, e: int, n_max: int = 9) -> PolarCode:
    """Compute N and the frozen/info sets (TS 38.212 §5.3.1.2, n_PC = 0).

    n_max: 9 for DL (PDCCH/PBCH), 10 for UL (UCI).
    """
    assert 0 < k <= e
    cl2e = math.ceil(math.log2(e))
    if e <= (9 / 8) * (1 << (cl2e - 1)) and k / e < 9 / 16:
        n1 = cl2e - 1
    else:
        n1 = cl2e
    r_min = 1 / 8
    n2 = math.ceil(math.log2(k / r_min))
    n = max(5, min(n1, n2, n_max))
    nval = 1 << n

    if e >= nval:
        rm_mode = "repetition"
    elif 16 * k <= 7 * e:
        rm_mode = "puncturing"
    else:
        rm_mode = "shortening"

    # Pre-frozen positions from rate matching (§5.4.1.1 inverse view).
    jn = tables.subblock_interleaver(n)
    pre_frozen = np.zeros(nval, dtype=bool)
    if rm_mode == "puncturing":
        u = nval - e
        pre_frozen[jn[:u]] = True
        if e >= 3 * nval // 4:
            t = math.ceil(3 * nval / 4 - e / 2)
        else:
            t = math.ceil(9 * nval / 16 - e / 4)
        pre_frozen[:t] = True
    elif rm_mode == "shortening":
        pre_frozen[jn[e:]] = True

    # Pick the K most reliable non-pre-frozen positions.
    rel = tables.reliability_sequence(n)  # ascending reliability
    usable = [int(i) for i in rel if not pre_frozen[i]]
    assert len(usable) >= k, (k, e, n, rm_mode)
    info = sorted(usable[-k:])
    return PolarCode(k=k, e=e, n=n, rm_mode=rm_mode, info_set=tuple(info))


@functools.lru_cache(maxsize=None)
def rate_match_indices(code: PolarCode) -> np.ndarray:
    """(E,) gather indices into the N coded bits d -> transmitted e."""
    jn = tables.subblock_interleaver(code.n)
    nval = code.nval
    e = code.e
    if code.rm_mode == "repetition":
        return jn[np.arange(e) % nval]
    if code.rm_mode == "puncturing":
        return jn[np.arange(e) + (nval - e)]
    return jn[np.arange(e)]  # shortening


@functools.lru_cache(maxsize=None)
def channel_interleaver_pattern(e: int) -> np.ndarray:
    """UL triangular channel interleaver (TS 38.212 §5.4.1.3, I_BIL = 1).

    Returns perm with out[k] = in[perm[k]].
    """
    t = 0
    while t * (t + 1) // 2 < e:
        t += 1
    # Fill the triangle row-wise with input indices, read column-wise.
    rows = []
    k = 0
    for i in range(t):
        row = []
        for j in range(t - i):
            row.append(k if k < e else -1)
            k += 1
        rows.append(row)
    out = []
    for j in range(t):
        for i in range(t):
            if j < len(rows[i]) and rows[i][j] >= 0:
                out.append(rows[i][j])
    assert len(out) == e
    return np.asarray(out, dtype=np.int32)
