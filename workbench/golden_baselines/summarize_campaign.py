"""Summarize the baseline parity campaign: reference-executed vs ours.

Parses logs/ref/*.log (reference baselines run via the compat wrappers) and
logs/ours/*.log (our CLI), pairs them per (model, dataset), and emits a
markdown table + JSON artifact.

Protocol per model follows the REFERENCE trainer's own reporting:
  * gcn family  — test accuracy at the final epoch after window-mean early
    stop (reference train.py:190-194): ours = last per-epoch line.
  * mixhop      — test at best validation accuracy (AccuracyMonitor):
    both sides' best-val record.
  * graphsage   — best-val record (model.py:152-155).
  * gat         — test after restoring the best-val checkpoint
    (execute_cora_sparse.py:242-249).

Usage: python summarize_campaign.py [--json docs/baseline_parity.json]
"""
import argparse
import collections
import json
import os
import re
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))

REF_PATTERNS = {
    # model key -> regex over the whole log, last match wins
    "gcn_family": re.compile(r"Test set results:.*accuracy= ([0-9.]+)"),
    "mixhop": re.compile(r"@ best val test=([0-9.]+)"),
    "graphsage": re.compile(r"'test_accuracy': ([0-9.]+)"),
    "gat": re.compile(r"Test accuracy: ([0-9.]+)"),
}

OURS_EPOCH = re.compile(r"Epoch: *\d+ .*Test Acc: *([0-9.]+)%")
OURS_BEST = re.compile(
    r"Best performance:\s*\n(?:Epoch: *\d+ +)?.*Test Acc: *([0-9.]+)%")

GCN_FAMILY = {"gcn", "gcn_cheby", "dense", "gcn_concat_2", "gcn_cheby_concat_2"}
OUR_VARIANT_TO_REF = {
    "gcn": "gcn", "cheby": "gcn_cheby", "mlp": "dense",
    "concat2": "gcn_concat_2", "cheby_concat2": "gcn_cheby_concat_2",
}


def parse_ref(path, name):
    with open(path) as f:
        text = f.read()
    if not text.strip().endswith("DONE_OK"):
        return None
    model = name.split("_", 1)[1].rsplit("_s", 1)[0]  # strip ref_ prefix, seed
    base = model.rsplit("_", 1)[0] if model.rsplit("_", 1)[-1] in (
        "cora", "citeseer") else model
    if base in GCN_FAMILY:
        pat = REF_PATTERNS["gcn_family"]
    elif base.startswith("mixhop"):
        pat = REF_PATTERNS["mixhop"]
    elif base.startswith("graphsage"):
        pat = REF_PATTERNS["graphsage"]
    elif base.startswith("gat"):
        pat = REF_PATTERNS["gat"]
    else:
        return None
    hits = pat.findall(text)
    return float(hits[-1]) if hits else None


def parse_ours(path, final_epoch_protocol):
    with open(path) as f:
        text = f.read()
    if not text.strip().endswith("DONE_OK"):
        return None
    if final_epoch_protocol:
        hits = OURS_EPOCH.findall(text)
        return float(hits[-1]) / 100.0 if hits else None
    m = OURS_BEST.findall(text)
    return float(m[-1]) / 100.0 if m else None


def collect():
    groups = collections.defaultdict(lambda: {"ref": [], "ours": []})
    ref_dir = os.path.join(HERE, "logs", "ref")
    ours_dir = os.path.join(HERE, "logs", "ours")
    for fn in sorted(os.listdir(ref_dir)) if os.path.isdir(ref_dir) else []:
        if not fn.endswith(".log"):
            continue
        name = fn[:-4]
        acc = parse_ref(os.path.join(ref_dir, fn), name)
        if acc is None:
            continue
        key = name[len("ref_"):].rsplit("_s", 1)[0]  # model_dataset
        groups[key]["ref"].append(acc)
    for fn in sorted(os.listdir(ours_dir)) if os.path.isdir(ours_dir) else []:
        if not fn.endswith(".log"):
            continue
        name = fn[:-4]
        key = name[len("ours_"):].rsplit("_s", 1)[0]
        # translate our variant names to the reference's
        parts = key.rsplit("_", 1)
        model, ds = (parts[0], parts[1]) if len(parts) == 2 else (key, "")
        ref_model = OUR_VARIANT_TO_REF.get(model, model)
        final_proto = ref_model in GCN_FAMILY
        acc = parse_ours(os.path.join(ours_dir, fn), final_proto)
        if acc is None:
            continue
        groups[f"{ref_model}_{ds}"]["ours"].append(acc)
    return groups


def fmt(vals):
    if not vals:
        return "—"
    m = statistics.mean(vals) * 100
    s = statistics.stdev(vals) * 100 if len(vals) > 1 else 0.0
    return f"{m:.2f} ± {s:.2f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()
    groups = collect()
    print("| Config | Reference (executed) | h2gcn_tpu | Δ mean |")
    print("|---|---|---|---|")
    out = {}
    for key in sorted(groups):
        g = groups[key]
        d = ""
        if g["ref"] and g["ours"]:
            d = f"{(statistics.mean(g['ours']) - statistics.mean(g['ref'])) * 100:+.2f}"
        print(f"| {key} | {fmt(g['ref'])} | {fmt(g['ours'])} | {d} |")
        out[key] = {"ref": g["ref"], "ours": g["ours"]}
    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"\nwrote {opts.json}")


if __name__ == "__main__":
    main()
