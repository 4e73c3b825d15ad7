"""Summarize the cheby/cheby+JK ES-disabled control (run_cheby_control.sh).

Two readings per config:
  * best-val (ours' trainer default) vs the reference's final-epoch report
    — the frameworks' native selection rules, which are ASYMMETRIC (the
    reference GCN trainer has no model selection at all);
  * selection-MATCHED: ours read at epoch 200 like the reference.

Writes docs/cheby_control.json and prints the markdown table.
"""
import json
import pathlib
import re
import statistics

HERE = pathlib.Path(__file__).resolve().parent
LOGS = HERE / "logs" / "chebyctl"
SEEDS = "123 1 2 3 42 7 8 9 10 11".split()


def ref_final(path):
    m = re.findall(r"accuracy=\s*([0-9.]+)", path.read_text())
    return float(m[-1]) * 100 if m else None


def ours_best(path):
    lines = path.read_text().splitlines()
    for i, l in enumerate(lines):
        if "Best performance" in l:
            for j in range(i + 1, min(i + 4, len(lines))):
                mm = re.search(r"Test Acc:\s*([0-9.]+)%", lines[j])
                if mm:
                    return float(mm.group(1))
    return None


def ours_final(path):
    accs = re.findall(r"Epoch: 0*(\d+).*?Test Acc:\s*([0-9.]+)%",
                      path.read_text())
    ep200 = [a for e, a in accs if int(e) == 200]
    return float(ep200[0]) if ep200 else None


def fmt(v):
    return f"{statistics.mean(v):.2f} ± {statistics.stdev(v):.2f}"


def main():
    out = {}
    rows = []
    for ds in ("cora", "citeseer"):
        for fam, (rtag, otag) in {
                "cheby": ("ref_gcn_cheby", "ours_cheby"),
                "cheby_jk": ("ref_cheby_jk", "ours_cheby_jk")}.items():
            rv, ob, of = [], [], []
            for s in SEEDS:
                r = ref_final(LOGS / f"{rtag}_{ds}_s{s}.log")
                b = ours_best(LOGS / f"{otag}_{ds}_s{s}.log")
                f = ours_final(LOGS / f"{otag}_{ds}_s{s}.log")
                if None in (r, b, f):
                    continue
                rv.append(r)
                ob.append(b)
                of.append(f)
            n = len(rv)
            se = lambda a, b: (statistics.stdev(a) ** 2 / len(a)
                               + statistics.stdev(b) ** 2 / len(b)) ** 0.5
            out[f"{fam}/{ds}"] = {
                "n": n, "ref_final_epoch": fmt(rv),
                "ours_best_val": fmt(ob), "ours_final_epoch": fmt(of),
                "delta_matched": round(statistics.mean(of)
                                       - statistics.mean(rv), 2),
                "se_matched": round(se(of, rv), 2),
                "delta_native": round(statistics.mean(ob)
                                      - statistics.mean(rv), 2),
            }
            r = out[f"{fam}/{ds}"]
            rows.append(f"| {fam} {ds} | {r['ref_final_epoch']} | "
                        f"{r['ours_final_epoch']} | {r['delta_matched']} "
                        f"(SE {r['se_matched']}) | {r['ours_best_val']} "
                        f"({r['delta_native']:+.2f}) |")
    print("| Config | Reference (final epoch) | ours (final epoch) | "
          "Δ matched | ours (best-val) |")
    print("|---|---|---|---|---|")
    print("\n".join(rows))
    art = HERE.parent.parent / "docs" / "cheby_control.json"
    art.write_text(json.dumps(out, indent=1))
    print(f"wrote {art}")


if __name__ == "__main__":
    main()
