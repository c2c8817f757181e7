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
    lines = [
        "# Dynamic updates under load — measured",
        "",
        "The engine-side counterpart of the reference's HEADLINE experiment",
        "(dynamic_script_faiss.py:46-138; logs/dynamic_updates_faiss.txt:",
        "steady ~4,970 q/s, -53% during the 50% rebuild, recovery to 0.9769",
        "recall): a graph-served search loop RACING a concurrent updater",
        "that deletes a fraction of the base and re-inserts it, with an",
        "atomic snapshot swap per update phase, swept over the reference's",
        "25/50/75% update fractions. Raw interval rows live in",
        "`dynamicupdates_run.json`.",
        "",
        f"- Protocol: {d['protocol']}",
        f"- Fixture: `{d['sf_dir']}`, master `{d['master']}`, k={d['k']}",
        "",
        "| update % | phase | intervals | mean QPS | mean latency (ms) | mean recall | QPS vs steady |",
        "|---|---|---|---|---|---|---|",
    ]
    for run in d["runs"]:
        summary = {r["phase"]: r for r in run["summary"]}
        steady = summary.get("steady", {"mean_qps": 0})
        for r in run["summary"]:
            if r["n"] == 0:
                continue
            ratio = (float(r["mean_qps"]) / float(steady["mean_qps"])
                     if float(steady["mean_qps"]) else 0.0)
            lines.append(
                f"| {run['update_pct']} | {r['phase']} | {r['n']} | "
                f"{float(r['mean_qps']):.1f} | {float(r['mean_latency_ms']):.1f} | "
                f"{float(r['mean_recall']):.4f} | {ratio:.2f}x |")
    lines += [
        "",
        "Update publish latency (the snapshot-swap points, M8 events",
        "`delete_end`/`insert_end` in the interval rows):",
        "",
        "| update % | delete publish (s) | re-insert publish (s) |",
        "|---|---|---|",
    ]
    for run in d["runs"]:
        lines.append(
            f"| {run['update_pct']} | {float(run['delete_publish_ms'])/1000.0:.2f} | "
            f"{float(run['insert_publish_ms'])/1000.0:.2f} |")
    lines += [
        "",
        "Interval logs (phase-tagged; sentinel events as the `event`",
        "column, M8):",
        "",
        "| update % | interval | phase | QPS | latency (ms) | recall | event |",
        "|---|---|---|---|---|---|---|",
    ]
    for run in d["runs"]:
        for r in run["intervals"]:
            lines.append(
                f"| {run['update_pct']} | {r['interval']} | {r['phase']} | "
                f"{float(r['qps']):.1f} | {float(r['latency_ms']):.1f} | "
                f"{float(r['recall']):.4f} | {r['event'] or ''} |")
    # Narrative figures are COMPUTED from the loaded run (r9 review: the
    # old template baked one run's literals into the commentary, so a
    # regenerated table would contradict its own prose).
    def phase(run, name):
        return {r["phase"]: r for r in run["summary"]}.get(name, {})

    def fmt_by_pct(getter, prec):
        return " / ".join(f"{getter(run):.{prec}f}" for run in d["runs"])

    pcts = " / ".join(str(run["update_pct"]) for run in d["runs"])
    dips = []
    for run in d["runs"]:
        sq = float(phase(run, "steady").get("mean_qps", 0.0))
        if sq <= 0:
            # no steady baseline -> no meaningful dip; skip rather than
            # fabricate a percentage against a made-up denominator
            continue
        for p in ("during_delete", "during_insert"):
            mq = float(phase(run, p).get("mean_qps", 0.0))
            if mq:
                dips.append(100.0 * (1.0 - mq / sq))
    dip_lo, dip_hi = (min(dips), max(dips)) if dips else (float("nan"), float("nan"))
    steady_recall = sum(
        float(phase(run, "steady").get("mean_recall", 0.0)) for run in d["runs"]
    ) / max(len(d["runs"]), 1)
    del_s = sum(float(r["delete_publish_ms"]) for r in d["runs"]) / max(len(d["runs"]), 1) / 1000.0
    ins_s = sum(float(r["insert_publish_ms"]) for r in d["runs"]) / max(len(d["runs"]), 1) / 1000.0
    holes = fmt_by_pct(lambda r: float(phase(r, "during_insert").get("mean_recall", 0.0)), 3)
    recov = fmt_by_pct(lambda r: float(phase(r, "recovered").get("mean_recall", 0.0)), 3)
    during_del = fmt_by_pct(lambda r: float(phase(r, "during_delete").get("mean_recall", 0.0)), 3)
    lines += [
        "",
        "Reading:",
        "",
        f"- **Contention dip**: during-update intervals run {dip_lo:.0f}-{dip_hi:.0f}% below",
        "  steady QPS — the updater's jobs share the executor cores with",
        "  the measuring loop. The dip is far shallower than the",
        "  reference's -53% because deletion here is an adjacency",
        f"  edge-filter (D2, publishes in ~{del_s:.1f} s) and re-insertion touches",
        f"  O(|new|*degree) rows (D1, ~{ins_s:.1f} s) where the embedded reference",
        "  backends must REBUILD the index (D3) and starve the search",
        "  loop for the whole window.",
        "- **Recall hole and recovery**: recall is always scored against",
        "  the ORIGINAL full-base ground truth (the reference's protocol),",
        "  so the post-delete window shows a hole equal to the deleted",
        f"  share of gt ({holes} at {pcts}%) and the",
        f"  beam re-insert closes it ({recov} vs steady",
        f"  {steady_recall:.3f}). Recovery degrades with update fraction — incremental",
        "  insertion of 75% of the corpus into a 25% skeleton is the",
        "  regime where a rebuild (D3) beats incremental maintenance,",
        "  the same tradeoff the reference's backends sit on the other",
        "  side of.",
        "- **Snapshot isolation (C2)**: during-delete intervals still read",
        f"  pre-swap recall ({during_del} at {pcts}%) — searches hold",
        "  the pre-swap snapshot until the updater publishes; no interval",
        "  ever observes a half-applied update.",
        "",
    ]
    with open(dst, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
