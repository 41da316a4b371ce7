"""Round-5 stall-proof campaign queue (VERDICT round-4 item 2).

The round-3/4 postmortem: monolithic chain scripts sequenced by a single
master process delivered their early stages, but when the builder session
stalled the tail of the queue silently died with it — the 96^2 cells were
open for three rounds because chains-on-disk score zero.

This runner replaces the chains with a PERSISTENT ON-DISK QUEUE:
  * stages live in a JSON file (scripts/r5_stages.json, committed, re-read
    every iteration so stages can be appended mid-round);
  * each completed stage writes a done marker (data_r2/queue/done/<id>)
    with exit code + wall time, and the cursor state (state.json) is
    rewritten after every transition — committable evidence;
  * a flock guarantees a single runner; any fresh process (supervisor,
    builder session, cron) can exec this script at any time and it resumes
    from the first un-done stage — kill it mid-stage, restart, it re-runs
    that stage (stage commands are idempotent: trainers resume from
    checkpoints, scorers skip existing metrics files);
  * gates per stage: soft deadline (/tmp/r5_soft_deadline) for productive
    stages, margin-vs-hard-deadline (/tmp/r5_hard_deadline) for endgame
    stages, and a fresh-subprocess backend health probe
    (utils.health.wait_for_backend) so a wedged axon pool skips stages
    instead of hanging them.

Usage:
    setsid nohup python -u scripts/r5_queue.py >> data_r2/logs/r5_queue.log 2>&1 &
    (or via scripts/r5_supervisor.sh, which respawns it if it dies)
"""
import fcntl
import json
import os
import signal
import subprocess
import sys
import time

REPO = "/root/repo"
# env overrides let tests / the kill-resume demo run against a sandbox queue
STAGES = os.environ.get("R5_STAGES",
                        os.path.join(REPO, "scripts", "r5_stages.json"))
QDIR = os.environ.get("R5_QDIR", os.path.join(REPO, "data_r2", "queue"))
DONE = os.path.join(QDIR, "done")
STATE = os.path.join(QDIR, "state.json")
LOCK = os.path.join(QDIR, "runner.lock")
LOGS = os.environ.get("R5_LOGS", os.path.join(REPO, "data_r2", "logs"))
SOFT = os.environ.get("R5_SOFT", "/tmp/r5_soft_deadline")
HARD = os.environ.get("R5_HARD", "/tmp/r5_hard_deadline")


def stamp(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def read_deadline(path, default):
    try:
        with open(path) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return default


def load_stages():
    with open(STAGES) as f:
        return json.load(f)


def write_state(stages, current=None, note=""):
    done_ids = set(os.listdir(DONE)) if os.path.isdir(DONE) else set()
    rows = []
    for s in stages:
        row = {"id": s["id"], "status": "done" if s["id"] in done_ids
               else ("running" if s["id"] == current else "pending")}
        marker = os.path.join(DONE, s["id"])
        if row["status"] == "done":
            try:
                with open(marker) as f:
                    row.update(json.load(f))
            except (OSError, ValueError):
                pass
        rows.append(row)
    tmp = STATE + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"heartbeat": time.time(),
                   "heartbeat_h": time.strftime("%H:%M:%S"),
                   "pid": os.getpid(), "current": current, "note": note,
                   "stages": rows}, f, indent=1)
    os.replace(tmp, STATE)


def gate(stage):
    """Return (ok, reason) from the DEADLINE gates only (backend health is
    probed at most once per queue pass in main — a wedged backend must not
    cost one 900 s probe per pending stage). Productive stages refuse after
    the soft deadline; endgame stages refuse within `margin` s of the hard
    one."""
    now = int(time.time())
    hard = read_deadline(HARD, now + 86400)
    if stage.get("endgame"):
        margin = int(stage.get("margin", 900))
        if now >= hard - margin:
            return False, f"<{margin}s to hard deadline"
    else:
        soft = read_deadline(SOFT, hard)
        if now >= soft:
            return False, "soft deadline passed"
    # NOTE: a long-timeout stage MAY start even if it cannot finish before
    # the hard deadline — quiescence is the watchdog's job (it kills the
    # runner's whole process group at the hard deadline) and every stage
    # command is restart-safe (checkpointed trainers, skip-existing
    # generators/scorers, atomic to_npz). Refusing such stages wasted the
    # tail of round 4's window.
    return True, ""


def probe_backend():
    """One subprocess probe cycle (<= ~16 min when the pool is wedged)."""
    r = subprocess.run(
        [sys.executable, "-c",
         "from pyqg_generative_tpu.utils.health import wait_for_backend;"
         "import sys; sys.exit(0 if wait_for_backend(deadline_s=900)"
         " else 1)"], cwd=REPO)
    return r.returncode == 0


def bump_attempts(sid):
    adir = os.path.join(QDIR, "attempts")
    os.makedirs(adir, exist_ok=True)
    path = os.path.join(adir, sid)
    try:
        with open(path) as f:
            n = int(f.read().strip())
    except (OSError, ValueError):
        n = 0
    with open(path, "w") as f:
        f.write(str(n + 1))
    return n + 1


def run_stage(stage):
    sid = stage["id"]
    log_path = os.path.join(LOGS, f"r5_{sid}.log")
    t0 = time.time()
    attempt = bump_attempts(sid)
    stamp(f"stage {sid}: START attempt {attempt} "
          f"(timeout {stage.get('timeout', 600)}s) -> {log_path}")
    with open(log_path, "a") as lf:
        lf.write(f"\n==== {time.strftime('%F %T')} stage {sid} "
                 f"attempt {attempt} ====\n")
        lf.flush()
        try:
            r = subprocess.run(
                ["timeout", str(stage.get("timeout", 600)), "bash", "-c",
                 stage["cmd"]],
                cwd=REPO, stdout=lf, stderr=subprocess.STDOUT)
            rc = r.returncode
        except Exception as e:  # noqa: BLE001 — record, don't die
            lf.write(f"runner exception: {e}\n")
            rc = -1
    wall = time.time() - t0
    # retry support: a failed (or timed-out, rc=124) stage whose command is
    # restartable (trainers resume from checkpoints, generators/scorers skip
    # existing files) is NOT marked done until its attempts are exhausted —
    # the next queue pass re-runs it and it continues where it stopped.
    allowed = 1 + int(stage.get("retries", 0))
    if rc != 0 and attempt < allowed:
        stamp(f"stage {sid}: rc={rc} in {wall / 60:.1f} min — "
              f"attempt {attempt}/{allowed}, will retry")
        return rc
    os.makedirs(DONE, exist_ok=True)
    tmp = os.path.join(DONE, sid + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"rc": rc, "wall_s": round(wall, 1), "attempts": attempt,
                   "finished": time.strftime("%F %T")}, f)
    os.replace(tmp, os.path.join(DONE, sid))
    stamp(f"stage {sid}: DONE rc={rc} in {wall / 60:.1f} min")
    return rc


def main():
    os.chdir(REPO)
    os.makedirs(DONE, exist_ok=True)
    os.makedirs(LOGS, exist_ok=True)
    lock_f = open(LOCK, "w")
    try:
        fcntl.flock(lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError:
        stamp("another runner holds the lock — exiting")
        return 0
    lock_f.write(str(os.getpid()))
    lock_f.flush()
    with open("/tmp/r5_roots", "a") as f:
        f.write(f"{os.getpid()}\n")
    # die cleanly on SIGTERM so the watchdog leaves no half-written marker
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    stamp(f"runner pid {os.getpid()} — queue at {STATE}")
    skipped_gate: dict = {}
    while True:
        stages = load_stages()
        done_ids = set(os.listdir(DONE))
        pending = [s for s in stages if s["id"] not in done_ids]
        if not pending:
            write_state(stages, note="all stages done")
            stamp("queue complete")
            return 0
        progressed = False
        backend_ok = None   # lazily probed, at most once per pass
        for s in pending:
            ok, why = gate(s)
            if ok and s.get("backend", True):
                if backend_ok is None:
                    backend_ok = probe_backend()
                if not backend_ok:
                    ok, why = False, "backend down after 900s of probing"
            if not ok:
                if skipped_gate.get(s["id"]) != why:
                    stamp(f"stage {s['id']}: gated ({why})")
                    skipped_gate[s["id"]] = why
                # soft-deadline gating is terminal for this stage in this
                # pass, but a later endgame stage may still be eligible
                continue
            write_state(stages, current=s["id"])
            run_stage(s)
            write_state(stages)
            progressed = True
            break  # re-read stages (they may have been edited mid-round)
        if not progressed:
            now = int(time.time())
            hard = read_deadline(HARD, now + 86400)
            if now >= hard:
                write_state(stages, note="hard deadline — runner exiting")
                stamp("hard deadline — exiting with pending stages gated")
                return 0
            write_state(stages, note="all pending stages gated; waiting")
            time.sleep(60)


if __name__ == "__main__":
    sys.exit(main())
