"""Render quality_converged.py / quality_crossover.py artifacts as the
markdown tables BASELINE.md quotes — one authoritative formatter instead
of hand-transcribed numbers (the round-2/round-3 doc-vs-data divergences
both came from hand transcription).

Usage:
  python benchmarks/report_converged.py runs/imagenet64_conv/converged_it10000.json
  python benchmarks/report_converged.py runs/celeba_crossover/crossover.json
"""

from __future__ import annotations

import json
import sys


def fmt(v, nd=3):
    return f"{v:.{nd}f}" if isinstance(v, (int, float)) else "—"


def report_converged(d: dict) -> str:
    lines = []
    lines.append(f"Converged study: {d['preset']} it{d['niters']} "
                 f"(EMA decay {d['decay']}), equal accepted pools of "
                 f"{d.get('pool', '?')}")
    t = d.get("tuned", {})
    for arm, kr in t.items():
        lines.append(f"- {arm} tuned (K, rate) = ({kr['k']}, {kr['rate']})")
    if d.get("pool_bias"):
        bias = ", ".join(f"{n}: {fmt(v)}" for n, v in d["pool_bias"].items())
        lines.append(f"- pool-size bias (standard/plain pool): {bias}")
    lines.append("")
    lines.append("| arm | method | FID (equal pool) | FID (full pool) | accept |")
    lines.append("|---|---|---|---|---|")
    for key, row in d.get("table", {}).items():
        arm, method = key.split(":", 1)
        lines.append(
            f"| {arm} | {method} | {fmt(row.get('fid'))} | "
            f"{fmt(row.get('fid_full_pool'))} | "
            f"{fmt(row.get('accept_rate_full_pool', row.get('accept_rate')), 2)} |")
    return "\n".join(lines)


def report_crossover(d: dict) -> str:
    m = d.get("metric", "fid")
    lines = [f"Crossover: {d['preset']}, pool {d.get('pool')}, metric {m}", ""]
    lines.append(f"| depth | tuned (K, rate) | standard | collab | "
                 f"collab --safe | collab Δ% |")
    lines.append("|---|---|---|---|---|---|")
    for depth, row in d.get("curve", {}).items():
        kr = row.get("tuned", {})
        lines.append(
            f"| it{depth} | ({kr.get('k')}, {kr.get('rate')}) | "
            f"{fmt(row.get('standard', {}).get(m))} | "
            f"{fmt(row.get('collab', {}).get(m))} | "
            f"{fmt(row.get('collab_safe', {}).get(m))} | "
            f"{fmt(row.get('collab_delta_pct'), 1)} |")
    return "\n".join(lines)


def main():
    path = sys.argv[1]
    with open(path) as fh:
        d = json.load(fh)
    if "curve" in d:
        print(report_crossover(d))
    else:
        print(report_converged(d))


if __name__ == "__main__":
    main()
