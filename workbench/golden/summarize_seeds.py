"""Aggregate reference-vs-ours multi-seed accuracy from the golden logs.

Parses the `Best performance:` block of each training log (reference TF2
runs via run_reference_train.py; ours via h2gcn_tpu.run_experiments) and
prints the mean±std table used in docs/BENCHMARKS.md.

Usage: python summarize_seeds.py [ref_glob] [ours_glob]
  default globs: ref_train_*.log  ours/ours_*.log
  e.g. the lr-matched pair:  ref_train_*.log  ours_lr3/ours_*.log
       the published-lr pair: ref_lr01/ref_*.log  ours/ours_*.log
       the pubmed-identity campaign:
         python summarize_seeds.py 'pubmed_identity/ref_*.log' \
                                   'pubmed_identity/ours_*.log'
  (configs are auto-discovered from the filenames; dataset-less tags like
   plain `h2gcn1` come from single-dataset campaign dirs)
"""
import glob
import os
import re
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
# preferred row order; tags discovered from filenames but absent here are
# appended alphabetically (e.g. the pubmed_identity campaign's bare
# `h2gcn1`/`h2gcn2` tags)
CONFIG_ORDER = ["h2gcn2_cora", "h2gcn1_cora", "h2gcn2_citeseer",
                "h2gcn1_citeseer", "h2gcn2", "h2gcn1"]


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
        m = re.match(
            r"(?:ours_|ref_train_|ref_)(h2gcn[12](?:_[a-z]+)?)(?:_s(\d+))?\.log$",
            name)
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


# two-sided t critical values for the paired-Δ 95% CI (df = n_seeds - 1)
_T95 = {4: 2.776, 7: 2.365, 19: 2.093, 20: 2.086, 24: 2.064}


def _t95(df):
    if df in _T95:
        return _T95[df]
    return 2.09 if df >= 15 else 2.776  # good to ~1% in the ranges used


def main():
    ref = collect(sys.argv[1] if len(sys.argv) > 1 else "ref_train_*.log")
    ours = collect(sys.argv[2] if len(sys.argv) > 2 else "ours/ours_*.log")
    criterion = 0.3  # BASELINE.md accuracy-parity bar (percentage points)
    configs = [t for t in CONFIG_ORDER if t in ref or t in ours]
    configs += sorted((set(ref) | set(ours)) - set(configs))
    print("| Config | Reference TF2 (mean±std) | h2gcn_tpu (mean±std) "
          "| Δ mean [95% CI] | abs(Δ)<0.3? |")
    print("|---|---|---|---|---|")
    for tag in configs:
        rseeds, oseeds = ref.get(tag, {}), ours.get(tag, {})
        shared = sorted(set(rseeds) & set(oseeds))
        rv = [rseeds[s] for s in shared]
        ov = [oseeds[s] for s in shared]
        pretty = tag.replace("h2gcn1", "H2GCN-1").replace("h2gcn2", "H2GCN-2")
        pretty = pretty.replace("_cora", " Cora").replace("_citeseer", " Citeseer")
        pretty = pretty.replace("_pubmed", " Pubmed")
        if not shared:
            print(f"| {pretty} | — | — | — | — |")
            continue
        # PAIRED per-seed deltas: shared seeds make the seed-to-seed
        # variance cancel, which is the whole point of the shared-seed
        # protocol
        dv = [o - r for o, r in zip(ov, rv)]
        dmean = statistics.mean(dv)
        if len(dv) >= 2:
            half = _t95(len(dv) - 1) * statistics.stdev(dv) / len(dv) ** 0.5
            ci = f"{dmean:+.2f} [{dmean - half:+.2f}, {dmean + half:+.2f}]"
            verdict = ("PASS" if abs(dmean) + half <= criterion else
                       ("pass (mean)" if abs(dmean) <= criterion
                        else "FAIL"))
        else:
            ci, verdict = f"{dmean:+.2f}", "n<2"
        print(f"| {pretty} | {fmt(rv)} | {fmt(ov)} | {ci} | {verdict} |")
    n = min(len(set(ref.get(t, {})) & set(ours.get(t, {}))) for t in configs)
    seeds = sorted(set.intersection(*[set(ref.get(t, {})) & set(ours.get(t, {}))
                                      for t in configs]), key=int)
    print(f"\nseeds per config: {n}  ({', '.join(seeds)})")
    print("criterion: PASS = whole 95% CI inside ±0.3pp; "
          "'pass (mean)' = mean inside, CI spills")


if __name__ == "__main__":
    main()
