#!/usr/bin/env python3
"""RX power analyzer: IQ power statistics from a capture file or the UDP
IQ transport.

Counterpart of the reference's apps/examples/radio/rx_power_analyzer.cpp:
reports average/peak power (dBFS), PAPR, a coarse amplitude histogram and
(optionally) the clip probability against a full-scale ceiling — the
bring-up tool for checking RU gain staging before running a cell.

Usage:
  python tools/rx_power_analyzer.py capture.dat --kind cf32
  python tools/rx_power_analyzer.py --udp-port 9870 --seconds 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(iq: np.ndarray, full_scale: float = 1.0) -> dict:
    mag2 = np.abs(iq.astype(np.complex64)) ** 2
    avg = float(mag2.mean()) if mag2.size else 0.0
    peak = float(mag2.max()) if mag2.size else 0.0
    fs2 = full_scale * full_scale
    hist_edges_db = [-60, -40, -30, -20, -10, -6, -3, 0]
    with np.errstate(divide="ignore"):
        inst_db = 10.0 * np.log10(np.maximum(mag2 / fs2, 1e-30))
    hist = np.histogram(inst_db, bins=[-1e9] + hist_edges_db + [1e9])[0]
    return {
        "nof_samples": int(iq.size),
        "avg_power_dbfs": round(10.0 * np.log10(max(avg / fs2, 1e-30)), 2),
        "peak_power_dbfs": round(10.0 * np.log10(max(peak / fs2, 1e-30)), 2),
        "papr_db": round(10.0 * np.log10(max(peak / max(avg, 1e-30), 1.0)), 2),
        "clip_probability": round(float((mag2 >= fs2).mean()), 6) if mag2.size else 0.0,
        "histogram_dbfs_bins": hist_edges_db,
        "histogram_counts": hist.tolist(),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", nargs="?", help="IQ capture (file_vector format)")
    ap.add_argument("--kind", default="cf32", choices=["cf32", "cbf16"],
                    help="capture sample format")
    ap.add_argument("--full-scale", type=float, default=1.0)
    ap.add_argument("--udp-port", type=int, default=None,
                    help="listen for native UDP IQ frames instead of a file")
    ap.add_argument("--seconds", type=float, default=1.0,
                    help="capture duration in UDP mode")
    args = ap.parse_args()

    if args.udp_port is not None:
        from srsran_project_tpu.support import native

        sock = native.IqSocket.rx(args.udp_port)
        chunks = []
        deadline = time.monotonic() + args.seconds
        while time.monotonic() < deadline:
            r = sock.recv(timeout_ms=100)
            if r is not None:
                _, _, _, iq16 = r
                chunks.append(iq16.astype(np.float32).view(np.float32))
        sock.close()
        if not chunks:
            print(json.dumps({"error": "no frames received"}))
            return 1
        flat = np.concatenate(chunks)
        iq = (flat[0::2] + 1j * flat[1::2]) / 32768.0
    else:
        if not args.path:
            ap.error("a capture path or --udp-port is required")
        from srsran_project_tpu.support.file_vector import read_vector

        iq = read_vector(args.path, args.kind)

    print(json.dumps(analyze(iq, args.full_scale)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
