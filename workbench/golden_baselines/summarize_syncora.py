"""Summarize the cross-framework syn-cora parity campaign.

Both frameworks print the same "Best performance" epoch-line format; group
test accuracies by homophily h and framework, print the parity table.

Usage: python summarize_syncora.py [--json docs/syncora_crossparity.json]
"""
import argparse
import collections
import json
import os
import re
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))
BEST = re.compile(r"Best performance:\s*\n.*Test Acc: *([0-9.]+)%")
H_RE = re.compile(r"_(h0\.\d)-")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()
    groups = collections.defaultdict(lambda: collections.defaultdict(list))
    d = os.path.join(HERE, "logs", "syncora")
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".log"):
            continue
        text = open(os.path.join(d, fn)).read()
        if not text.strip().endswith("DONE_OK"):
            continue
        m = BEST.findall(text)
        hm = H_RE.search(fn)
        if not m or not hm:
            continue
        side = "ref" if fn.startswith("ref_") else "ours"
        groups[hm.group(1)][side].append(float(m[-1]))

    def fmt(vals):
        if not vals:
            return "—"
        mean = statistics.mean(vals)
        sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
        return f"{mean:.2f} ± {sd:.2f}"

    print("| h | Reference TF2 (executed) | h2gcn_tpu | Δ mean | n |")
    print("|---|---|---|---|---|")
    out = {}
    for h in sorted(groups):
        g = groups[h]
        delta = ""
        if g["ref"] and g["ours"]:
            delta = f"{statistics.mean(g['ours']) - statistics.mean(g['ref']):+.2f}"
        print(f"| {h[1:]} | {fmt(g['ref'])} | {fmt(g['ours'])} | {delta} "
              f"| {len(g['ref'])}/{len(g['ours'])} |")
        out[h] = dict(g)
    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {opts.json}")


if __name__ == "__main__":
    main()
