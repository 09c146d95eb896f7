#!/usr/bin/env python3
"""Command-line access to the visualization module (the reference's
tsne/ROI/table notebooks as one CLI).

  visualize.py roi   --csv <reconstruction_error_roi_*.csv> --hc 2 [--out map.png]
  visualize.py table --dirs <experiment dirs...> [--out summary.csv]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multi_modal_normative_modeling_tpu import viz  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    roi = sub.add_parser("roi", help="ROI deviation table + bar map")
    roi.add_argument("--csv", required=True)
    roi.add_argument("--hc", type=int, required=True)
    roi.add_argument("--top_k", type=int, default=25)
    roi.add_argument("--out", default="roi_deviation.png")

    table = sub.add_parser("table", help="AUC summary across experiments")
    table.add_argument("--dirs", nargs="+", required=True)
    table.add_argument("--out", default="auc_summary.csv")

    args = parser.parse_args()
    if args.cmd == "roi":
        frame = viz.roi_deviation_table(args.csv, args.hc, args.top_k)
        print(frame.to_string(index=False))
        viz.roi_deviation_map(args.csv, args.hc, args.out, args.top_k)
        print(f"wrote {args.out}")
    elif args.cmd == "table":
        frame = viz.auc_summary_table(args.dirs, args.out)
        print(frame.to_string(index=False))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
