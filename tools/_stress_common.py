"""Shared machinery for the stress harnesses (scale_stress,
centrality_stress, scc_stress): Spark-UI REST metric scraping,
/proc VmHWM peak-RSS parsing, and the RESULT-line subprocess
plumbing. One copy — a fix to the REST timeout or the app-id
assumption lands once, not three times (r7 third review)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import urllib.request


def rest_metrics(spark) -> dict:
    """Sum spill / max peak-execution-memory over completed stages via
    the UI REST API (local-mode AppStatusStore surface); best-effort."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    try:
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10)
        )
        # match the CURRENT application, not apps[0]: on a shared or
        # history-server-backed UI the first listed app can be another
        # run's, and the metrics would silently read the wrong job
        want = spark.sparkContext.applicationId
        app_id = next(
            (a["id"] for a in apps if a.get("id") == want), apps[0]["id"]
        )
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10,
            )
        )
    except Exception as exc:  # REST surface is best-effort telemetry
        return {"rest_error": str(exc)}
    return {
        "spill_memory_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "spill_disk_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "peak_execution_memory": max(
            (s.get("peakExecutionMemory", 0) for s in stages), default=0
        ),
        "n_stages": len(stages),
    }


def vm_hwm_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def spawn_result(script: str, args: list[str], cpus: int = 32) -> dict:
    """Run ``script run <args...>`` in a fresh interpreter/JVM and
    parse its RESULT json line."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    p = subprocess.run(
        [sys.executable, os.path.abspath(script), "run", *args],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{script} run {args}: no RESULT (rc={p.returncode})\n"
        f"stdout tail: {p.stdout[-2000:]}\nstderr tail: {p.stderr[-2000:]}"
    )
