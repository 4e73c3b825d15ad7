"""Aggregate reference-vs-ours multi-seed accuracy from the golden logs.

Parses the `Best performance:` block of each training log (reference TF2
runs via run_reference_train.py; ours via h2gcn_tpu.run_experiments) and
prints the mean±std table used in docs/BENCHMARKS.md.

Usage: python summarize_seeds.py [ref_glob] [ours_glob]
  default globs: ref_train_*.log  ours/ours_*.log
  e.g. the lr-matched pair:  ref_train_*.log  ours_lr3/ours_*.log
       the published-lr pair: ref_lr01/ref_*.log  ours/ours_*.log
"""
import glob
import os
import re
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIGS = ["h2gcn2_cora", "h2gcn1_cora", "h2gcn2_citeseer", "h2gcn1_citeseer"]


def best_test_acc(path):
    """Return the Test Acc (%) on the epoch line after `Best performance:`."""
    with open(path) as f:
        lines = f.readlines()
    for i, line in enumerate(lines):
        if "Best performance" in line:
            for j in range(i + 1, min(i + 4, len(lines))):
                m = re.search(r"Test Acc:\s*([0-9.]+)%", lines[j])
                if m:
                    return float(m.group(1))
    return None


def collect(pattern):
    accs = {}
    for path in sorted(glob.glob(os.path.join(HERE, pattern))):
        name = os.path.basename(path)
        m = re.match(r"(?:ours_|ref_train_|ref_)(h2gcn[12]_\w+?)(?:_s(\d+))?\.log$", name)
        if not m:
            continue
        tag, seed = m.group(1), m.group(2) or "123"
        acc = best_test_acc(path)
        if acc is None:
            print(f"WARNING: no Best performance in {name}", file=sys.stderr)
            continue
        accs.setdefault(tag, {})[seed] = acc
    return accs


def fmt(vals):
    if len(vals) < 2:
        return f"{vals[0]:.2f} (1 seed)" if vals else "—"
    return f"{statistics.mean(vals):.2f} ± {statistics.stdev(vals):.2f}"


def main():
    ref = collect(sys.argv[1] if len(sys.argv) > 1 else "ref_train_*.log")
    ours = collect(sys.argv[2] if len(sys.argv) > 2 else "ours/ours_*.log")
    print("| Config | Reference TF2 (mean±std) | h2gcn_tpu (mean±std) | Δ mean |")
    print("|---|---|---|---|")
    for tag in CONFIGS:
        rseeds, oseeds = ref.get(tag, {}), ours.get(tag, {})
        shared = sorted(set(rseeds) & set(oseeds))
        rv = [rseeds[s] for s in shared]
        ov = [oseeds[s] for s in shared]
        pretty = tag.replace("h2gcn1", "H2GCN-1").replace("h2gcn2", "H2GCN-2")
        pretty = pretty.replace("_cora", " Cora").replace("_citeseer", " Citeseer")
        delta = (statistics.mean(ov) - statistics.mean(rv)) if shared else float("nan")
        print(f"| {pretty} | {fmt(rv)} | {fmt(ov)} | {delta:+.2f} |")
    n = min(len(set(ref.get(t, {})) & set(ours.get(t, {}))) for t in CONFIGS)
    seeds = sorted(set.intersection(*[set(ref.get(t, {})) & set(ours.get(t, {}))
                                      for t in CONFIGS]), key=int)
    print(f"\nseeds per config: {n}  ({', '.join(seeds)})")


if __name__ == "__main__":
    main()
