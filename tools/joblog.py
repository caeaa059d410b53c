#!/usr/bin/env python3
"""Summarize a Spark event log: one line per job with duration, task count,
and the call site — where a query's wall time actually goes, job by job.

Usage: tools/joblog.py /tmp/sparklogs/<app-id> [--min-ms 0]
"""
import json
import sys


def main(path, min_ms=0.0):
    jobs = {}
    stages = {}
    order = []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                props = e.get("Properties") or {}
                jobs[jid] = {
                    "t0": e["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "callsite": props.get("callSite.short", ""),
                    "stages": e.get("Stage IDs", []),
                }
                order.append(jid)
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                }
    total = 0.0
    rows = []
    for jid in order:
        j = jobs[jid]
        if "t1" not in j:
            continue
        ms = j["t1"] - j["t0"]
        total += ms
        ntasks = sum(stages.get(s, {}).get("tasks", 0) for s in j["stages"])
        names = [stages[s]["name"].split(" at ")[-1]
                 for s in j["stages"] if s in stages]
        label = j["desc"] or j["callsite"] or (names[-1] if names else "?")
        rows.append((jid, ms, ntasks, len(j["stages"]), label,
                     ";".join(dict.fromkeys(names))))
    print(f"jobs={len(rows)} sum_job_ms={total:.0f}")
    for jid, ms, ntasks, nst, label, names in rows:
        if ms >= min_ms:
            print(f"  job {jid:>4} {ms:>7.0f} ms  stages={nst:<3} tasks={ntasks:<5} {label}  [{names}]")


if __name__ == "__main__":
    argv = sys.argv[1:]
    mm = 0.0
    if "--min-ms" in argv:
        i = argv.index("--min-ms")
        mm = float(argv[i + 1])
        del argv[i:i + 2]
    main(argv[0], mm)
