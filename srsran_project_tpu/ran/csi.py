"""CSI report sizing and (un)packing (TS 38.212 §6.3.1.1.2 / TS 38.214 §5.2).

Counterpart of the reference's csi_report helpers
(lib/ran/csi_report/csi_report_on_pusch_helpers.cpp): compute the bit
widths of CRI/RI/PMI/CQI fields for a type-I single-panel codebook report,
and pack/unpack payloads.  Used to size UCI part 1 / part 2 on PUCCH/PUSCH.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass(frozen=True)
class CsiReportConfig:
    nof_csi_rs_ports: int = 4  # 1, 2, 4 (type-I single panel, 1 panel)
    nof_csi_rs_resources: int = 1  # for CRI width
    ri_restriction: int = 0b1111  # allowed ranks bitmap
    cqi_table: str = "table1"
    subband_cqi: bool = False
    nof_subbands: int = 0


def cri_bitwidth(cfg: CsiReportConfig) -> int:
    return max(0, math.ceil(math.log2(max(1, cfg.nof_csi_rs_resources))))


def ri_bitwidth(cfg: CsiReportConfig) -> int:
    nof_allowed = bin(cfg.ri_restriction & ((1 << cfg.nof_csi_rs_ports) - 1)).count("1")
    return max(0, math.ceil(math.log2(max(1, nof_allowed))))


def pmi_bitwidth(cfg: CsiReportConfig, rank: int) -> int:
    """Type-I single panel PMI widths (TS 38.214 Table 5.2.2.2.1-2 family).

    2 ports: codebook index 2 bits (rank 1), 1 bit (rank 2).
    4 ports (N1=2, N2=1, no subband): i11 (2) + i2 widths per rank.
    """
    p = cfg.nof_csi_rs_ports
    if p == 1:
        return 0
    if p == 2:
        return 2 if rank == 1 else 1
    if p == 4:
        # N1=2, N2=1, O1=4: i11 in [0, 8) -> 3 bits... use the standard
        # single-panel widths for (N1,N2)=(2,1): rank1: i11 3b + i2 2b;
        # rank2: i11 3b + i13 1b + i2 1b; rank3/4: i11 3b + i2 1b.
        return {1: 5, 2: 5, 3: 4, 4: 4}[rank]
    raise ValueError(f"unsupported port count {p}")


def cqi_bitwidth(cfg: CsiReportConfig) -> int:
    wide = 4
    if cfg.subband_cqi:
        return wide + 2 * cfg.nof_subbands  # 2-bit differential per subband
    return wide


def part1_bitwidth(cfg: CsiReportConfig) -> int:
    """CSI part 1: CRI + RI + wideband CQI (rank-independent size)."""
    return cri_bitwidth(cfg) + ri_bitwidth(cfg) + 4


def part2_bitwidth(cfg: CsiReportConfig, rank: int) -> int:
    """CSI part 2: PMI (+ subband CQI for the second codeword if rank > 4)."""
    return pmi_bitwidth(cfg, rank) + (cqi_bitwidth(cfg) - 4)


def pack_part1(cfg: CsiReportConfig, cri: int, ri: int, cqi: int) -> np.ndarray:
    """Pack CSI part 1 fields MSB-first into a bit array."""
    out = []
    for value, width in ((cri, cri_bitwidth(cfg)), (ri - 1, ri_bitwidth(cfg)), (cqi, 4)):
        out.extend((value >> (width - 1 - i)) & 1 for i in range(width))
    return np.asarray(out, np.uint8)


def unpack_part1(cfg: CsiReportConfig, bits: np.ndarray):
    """Inverse of pack_part1; returns (cri, ri, cqi)."""
    pos = 0

    def take(width):
        nonlocal pos
        v = 0
        for i in range(width):
            v = (v << 1) | int(bits[pos])
            pos += 1
        return v

    cri = take(cri_bitwidth(cfg))
    ri = take(ri_bitwidth(cfg)) + 1
    cqi = take(4)
    return cri, ri, cqi


def pack_part2(cfg: CsiReportConfig, rank: int, pmi: int) -> np.ndarray:
    width = pmi_bitwidth(cfg, rank)
    return np.asarray([(pmi >> (width - 1 - i)) & 1 for i in range(width)], np.uint8)


def unpack_part2(cfg: CsiReportConfig, rank: int, bits: np.ndarray) -> int:
    v = 0
    for b in bits[: pmi_bitwidth(cfg, rank)]:
        v = (v << 1) | int(b)
    return v


def part2_size_from_part1(cfg: CsiReportConfig, part1_bits: np.ndarray) -> int:
    """UCI part 2 size derived from a decoded part 1 (the reference's
    uci_part2_size_calculator role): part 1 carries RI, which fixes the
    PMI width of part 2."""
    _, ri, _ = unpack_part1(cfg, part1_bits)
    return part2_bitwidth(cfg, ri)
