"""Collect the five-strategy round-5 results into a markdown table."""

import json
import os

ROWS = ["clskd", "reviewkd", "spkd", "mse", "stft"]


def main():
    print("| strategy | STOI | STOI imp | SDR (dB) | SDR imp | PESQ | "
          "PESQ imp | SI-SDR (dB) | val STOI (5 ep) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for s in ROWS:
        p = f"artifacts/r5_{s}/All_metric.json"
        v = None
        log = f"artifacts/r5_distill_{s}.log"
        if os.path.exists(log):
            for line in open(log):
                if '"final_metrics"' in line:
                    v = json.loads(line[line.index("{"):])["final_metrics"]
        if not os.path.exists(p):
            print(f"| {s} | (eval pending) | | | | | | | "
                  f"{v['stoi']:.4f} |" if v else f"| {s} | pending |")
            continue
        m = json.load(open(p))
        print(
            f"| {s} | {m['stoi']:.4f} | {m['stoi_imp']:+.4f} | "
            f"{m['sdr']:.2f} | {m['sdr_imp']:+.2f} | {m.get('pesq', 0):.2f} | "
            f"{m.get('pesq_imp', 0):+.2f} | {m['si_sdr']:.2f} | "
            + (f"{v['stoi']:.4f} |" if v else "- |")
        )


if __name__ == "__main__":
    main()
