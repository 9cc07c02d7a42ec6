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


def _metric_of(d: dict) -> str:
    """The artifact's metric name: recorded since round 5; for older
    artifacts, detected from the rows (2D campaigns score 'kl')."""
    m = d.get("metric")
    if m:
        return m
    rows = (d.get("table") or d.get("curve") or {}).values()
    return "kl" if any("kl" in r for r in rows) else "fid"


def report_converged(d: dict) -> str:
    m = _metric_of(d)
    lines = []
    lines.append(f"Converged study: {d['preset']} it{d['niters']} "
                 f"(EMA decay {d['decay']}), equal accepted pools of "
                 f"{d.get('pool', '?')}, metric {m.upper()}")
    t = d.get("tuned", {})
    for arm, kr in t.items():
        lines.append(f"- {arm} tuned (K, rate) = ({kr['k']}, {kr['rate']})")
    if d.get("pool_bias"):
        bias = ", ".join(f"{n}: {fmt(v)}" for n, v in d["pool_bias"].items())
        lines.append(f"- pool-size bias (standard/plain pool): {bias}")
    lines.append("")
    # Both accept-rate sources shown: 'accept (serve)' is the equal-pool
    # serving pass, 'accept (40b)' the full-pool 40-batch pass — mixing
    # them in one column made rows incomparable (ADVICE r4).
    lines.append(f"| arm | method | {m.upper()} (equal pool) | "
                 f"{m.upper()} (full pool) | accept (serve) | "
                 f"accept (40b) | pool |")
    lines.append("|---|---|---|---|---|---|---|")
    for key, row in d.get("table", {}).items():
        arm, method = key.split(":", 1)
        pool = row.get("pool")
        lines.append(
            f"| {arm} | {method} | {fmt(row.get(m))} | "
            f"{fmt(row.get(f'{m}_full_pool'))} | "
            f"{fmt(row.get('accept_rate'), 2)} | "
            f"{fmt(row.get('accept_rate_full_pool'), 2)} | "
            f"{pool if pool is not None else '—'} |")
    return "\n".join(lines)


def report_crossover(d: dict) -> str:
    m = _metric_of(d)
    arms = d.get("arms") or ["standard", "collab", "collab_safe"]
    lines = [f"Crossover: {d['preset']}, pool {d.get('pool')}, metric {m}",
             ""]
    head = " | ".join(a.replace("collab_safe", "collab --safe")
                      for a in arms)
    lines.append(f"| depth | tuned (K, rate) | {head} | collab Δ% |")
    lines.append("|---|" + "---|" * (len(arms) + 2))
    for depth, row in d.get("curve", {}).items():
        kr = row.get("tuned", {})
        cells = " | ".join(fmt(row.get(a, {}).get(m)) for a in arms)
        lines.append(
            f"| it{depth} | ({kr.get('k')}, {kr.get('rate')}) | "
            f"{cells} | {fmt(row.get('collab_delta_pct'), 1)} |")
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
