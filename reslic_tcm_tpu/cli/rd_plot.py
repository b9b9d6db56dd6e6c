"""RD-curve plotting CLI (reference src/rd_plot.py).

Plots rate-distortion curves (bpp vs PSNR) for one or more result sets. The
reference hardcodes its tables (rd_plot.py:118-128); those anchors are kept
available via --include-reference, and arbitrary curves can be passed as
JSON files {"name": ..., "bpp": [...], "psnr": [...]}.
"""

from __future__ import annotations

import argparse
import json
import sys

# In-code anchors from the reference (rd_plot.py:118-128, train.py:122-123).
REFERENCE_CURVES = {
    "proposed (stanh multi-rate)": {
        "bpp": [0.0952, 0.127, 0.1598, 0.1914, 0.2506, 0.3239, 0.375, 0.4269,
                0.4894, 0.5821, 0.6744, 0.7315],
        "psnr": [26.21, 27.0, 27.94, 28.74, 29.96, 31.11, 31.79, 32.4, 33.01,
                 33.83, 34.41, 34.633],
    },
    "gain": {
        "bpp": [0.09, 0.2024, 0.342, 0.7252, 0.8835],
        "psnr": [25.92, 27.58, 29.26, 34.19, 35.24],
    },
    "base": {
        "bpp": [0.131, 0.209, 0.320, 0.478, 0.669],
        "psnr": [27.58, 29.20, 30.97, 32.84, 34.53],
    },
}


def plot_rate_distorsion(curves: dict, output: str, title: str = ""):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    for name, c in curves.items():
        ax.plot(c["bpp"], c["psnr"], marker="o", label=name)
    ax.set_xlabel("bpp")
    ax.set_ylabel("PSNR (dB)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    if title:
        ax.set_title(title)
    fig.savefig(output, dpi=150, bbox_inches="tight")
    print(f"saved {output}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="RD curve plotting")
    parser.add_argument("--curves", nargs="*", default=[],
                        help="JSON files with {name, bpp, psnr}")
    parser.add_argument("--include-reference", action="store_true",
                        help="overlay the reference's published anchors")
    parser.add_argument("--output", type=str, default="rd_plot.png")
    parser.add_argument("--title", type=str, default="")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    curves = {}
    if args.include_reference:
        curves.update(REFERENCE_CURVES)
    for path in args.curves:
        with open(path) as f:
            c = json.load(f)
        curves[c.get("name", path)] = {"bpp": c["bpp"], "psnr": c["psnr"]}
    if not curves:
        parser.error("nothing to plot: pass --curves and/or --include-reference")
    plot_rate_distorsion(curves, args.output, args.title)
    return 0


if __name__ == "__main__":
    sys.exit(main())
