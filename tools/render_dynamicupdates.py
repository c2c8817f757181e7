#!/usr/bin/env python3
"""Render DYNAMICUPDATES.md from dynamicupdates_run.json
(tools/DynamicUpdatesRace output).

Usage: python3 tools/render_dynamicupdates.py dynamicupdates_run.json DYNAMICUPDATES.md
"""
import json
import sys


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        d = json.load(f)
    summary = {r["phase"]: r for r in d["summary"]}
    steady = summary.get("steady", {"mean_qps": 0})
    lines = [
        "# Dynamic updates under load — measured",
        "",
        "The engine-side counterpart of the reference's HEADLINE experiment",
        "(dynamic_script_faiss.py:46-138; logs/dynamic_updates_faiss.txt:",
        "steady ~4,970 q/s, -53% during the 50% rebuild, full recovery): a",
        "graph-served search loop RACING a concurrent updater that deletes",
        "50% of the base and re-inserts it, with an atomic snapshot swap per",
        "update phase. Raw interval rows live in `dynamicupdates_run.json`.",
        "",
        f"- Protocol: {d['protocol']}",
        f"- Fixture: `{d['sf_dir']}`, master `{d['master']}`,"
        f" update fraction {d['update_fraction']}, k={d['k']}",
        f"- Update publish latency: delete {float(d['delete_publish_ms'])/1000.0:.2f} s"
        f" (edge-filter, D2), re-insert {float(d['insert_publish_ms'])/1000.0:.2f} s"
        f" (beam insert, D1)",
        "",
        "| phase | intervals | mean QPS | mean latency (ms) | mean recall | QPS vs steady |",
        "|---|---|---|---|---|---|",
    ]
    for r in d["summary"]:
        if r["n"] == 0:
            continue
        ratio = (float(r["mean_qps"]) / float(steady["mean_qps"])
                 if float(steady["mean_qps"]) else 0.0)
        lines.append(
            f"| {r['phase']} | {r['n']} | {float(r['mean_qps']):.1f} | "
            f"{float(r['mean_latency_ms']):.1f} | {float(r['mean_recall']):.4f} | "
            f"{ratio:.2f}x |")
    lines += [
        "",
        "Interval log (sentinel events carried as the `event` column, M8):",
        "",
        "| interval | phase | QPS | latency (ms) | recall | event |",
        "|---|---|---|---|---|---|",
    ]
    for r in d["intervals"]:
        lines.append(
            f"| {r['interval']} | {r['phase']} | {float(r['qps']):.1f} | "
            f"{float(r['latency_ms']):.1f} | {float(r['recall']):.4f} | "
            f"{r['event'] or ''} |")
    lines += [
        "",
        "Reading: the during-update phases show the CONTENTION dip (updater",
        "jobs share the executor cores with the measuring loop — the",
        "reference's -53% window); the post-delete recall hole is the",
        "deleted half of the original ground truth (recall is always scored",
        "against the pre-delete gt, the reference's protocol) and it closes",
        "after the beam re-insert publishes. Deletion itself is an",
        "edge-filter (D2) — metadata-cheap where the reference's embedded",
        "backends must rebuild (D3); re-insertion touches O(|new|*degree)",
        "adjacency rows via beam-search insertion instead of a full",
        "build.",
        "",
    ]
    with open(dst, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
