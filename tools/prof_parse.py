#!/usr/bin/env python3
"""Parse a Spark event log (from graft.ProfR21) into per-job/stage time
attribution: wall, task time, scheduling overhead, shuffle bytes.

Usage: python3 tools/prof_parse.py /tmp/spark-events/<appid> [--stages]
"""
import json, sys, collections

path = sys.argv[1]
show_stages = "--stages" in sys.argv

jobs = {}            # jobId -> dict
stages = {}          # stageId -> dict
stage_tasks = collections.defaultdict(list)

for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerJobStart":
        jid = e["Job ID"]
        props = e.get("Properties") or {}
        jobs[jid] = {
            "group": props.get("spark.jobGroup.id", ""),
            "desc": (props.get("spark.job.description", "") or "")[:60],
            "start": e["Submission Time"],
            "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
        }
    elif ev == "SparkListenerJobEnd":
        jid = e["Job ID"]
        if jid in jobs:
            jobs[jid]["end"] = e["Completion Time"]
    elif ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        stages[sid] = {
            "name": si["Stage Name"],
            "ntasks": si["Number of Tasks"],
            "submit": si.get("Submission Time"),
            "complete": si.get("Completion Time"),
        }
    elif ev == "SparkListenerTaskEnd":
        sid = e["Stage ID"]
        ti = e["Task Info"]
        tm = e.get("Task Metrics") or {}
        sr = tm.get("Shuffle Read Metrics") or {}
        sw = tm.get("Shuffle Write Metrics") or {}
        stage_tasks[sid].append({
            "dur": ti["Finish Time"] - ti["Launch Time"],
            "run": tm.get("Executor Run Time", 0),
            "cpu": tm.get("Executor CPU Time", 0) / 1e6,
            "deser": tm.get("Executor Deserialize Time", 0),
            "gc": tm.get("JVM GC Time", 0),
            "sread": sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0),
            "fetchwait": sr.get("Fetch Wait Time", 0),
            "swrite": sw.get("Shuffle Bytes Written", 0),
            "input": (tm.get("Input Metrics") or {}).get("Bytes Read", 0),
        })

for jid in sorted(jobs):
    j = jobs[jid]
    wall = j.get("end", j["start"]) - j["start"]
    tsum = sum(t["dur"] for s in j["stages"] for t in stage_tasks.get(s, []))
    print(f"job {jid:3d} wall={wall:6d}ms tasktime={tsum:7d}ms  [{j['group']}] {j['desc']}")
    if show_stages:
        for s in j["stages"]:
            st = stages.get(s)
            tl = stage_tasks.get(s, [])
            if not st or not tl:
                continue
            swall = (st["complete"] or 0) - (st["submit"] or 0)
            run = sum(t["run"] for t in tl)
            cpu = sum(t["cpu"] for t in tl)
            sread = sum(t["sread"] for t in tl)
            swrite = sum(t["swrite"] for t in tl)
            inp = sum(t["input"] for t in tl)
            fw = sum(t["fetchwait"] for t in tl)
            mx = max(t["dur"] for t in tl)
            print(f"  stage {s:3d} n={len(tl):3d} wall={swall:6d}ms run={run:6d}ms "
                  f"cpu={cpu:7.0f}ms maxtask={mx:5d}ms in={inp//1024:6d}K "
                  f"sr={sread//1024:5d}K sw={swrite//1024:5d}K fw={fw}ms  {st['name'][:50]}")
