#!/usr/bin/env python3
"""Render MULTITENANT.md from multitenant_run.json (tools/ScalingRun output).

Usage: python3 tools/render_multitenant.py multitenant_run.json MULTITENANT.md
"""
import json
import sys


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        d = json.load(f)
    agg = d["aggregate"]
    base = next(r for r in agg if r["num_clients"] == min(a["num_clients"] for a in agg))
    lines = [
        "# Multi-tenant contention — measured",
        "",
        "The engine-side counterpart of the reference's scaling_behavior",
        "measurements (multi_tenant_script.py:149-180): N concurrent clients,",
        "each a Future running the full query batch as exact kNN (k=10)",
        "against one shared cached snapshot, one FAIR scheduler pool per",
        "client. Raw per-client rows live in `multitenant_run.json`.",
        "",
        f"- Protocol: {d['protocol']}",
        f"- Fixture: `{d['sf_dir']}`, master `{d['master']}`",
        "",
        "| clients | mean latency (ms) | mean QPS/client | aggregate QPS | mean recall | QPS vs min-n |",
        "|---|---|---|---|---|---|",
    ]
    for r in agg:
        ratio = float(r["mean_qps"]) / float(base["mean_qps"]) if float(base["mean_qps"]) else 0.0
        lines.append(
            f"| {r['num_clients']} | {float(r['mean_latency_ms']):.1f} | "
            f"{float(r['mean_qps']):.2f} | {float(r['sum_qps']):.2f} | "
            f"{float(r['mean_recall']):.4f} | {ratio:.2f}x |")
    per = d["per_client"]
    lines += [
        "",
        "Per-client spread (fairness check — FAIR pools should keep the",
        "within-count QPS spread tight):",
        "",
        "| clients | min QPS | max QPS | max/min |",
        "|---|---|---|---|",
    ]
    for n in sorted({r["num_clients"] for r in per}):
        qs = [float(r["qps"]) for r in per if r["num_clients"] == n]
        lines.append(
            f"| {n} | {min(qs):.2f} | {max(qs):.2f} | "
            f"{(max(qs) / min(qs)) if min(qs) else 0.0:.2f} |")
    lines += [
        "",
        "Reading: per-client throughput declines with client count (shared",
        "executor slots) while aggregate throughput stays roughly flat once",
        "the machine saturates — the same qualitative curve the reference",
        "plots. Recall is contention-independent (results are exact; the",
        "measured quantity is scheduling, not answer quality).",
        "",
    ]
    with open(dst, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
