"""Persistent single-process TPU job worker (axon session churn workaround).

The axon tunnel serializes client sessions and a freshly started jax process
frequently wedges forever at its first device dispatch if any other jax
process ran recently (see .claude/skills/verify/SKILL.md).  This worker holds
ONE long-lived jax session and executes job files submitted to a spool
directory, eliminating per-job session startup entirely.

Protocol:
  * submit:  write <spool>/NNN.py  (plain python, exec'd in a SHARED
             namespace that persists across jobs — imports/arrays carry over)
  * result:  worker writes NNN.out (stdout+stderr+traceback) then NNN.done
             (contains "ok" or "error")
  * stop:    submit a file whose content is exactly "STOP"

Run:   python scripts/tpu_worker.py [spool_dir]   (default /tmp/tpu_jobs)
"""
import io
import os
import sys
import time
import traceback

SPOOL = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
os.makedirs(SPOOL, exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one shared namespace: imports and device arrays persist across jobs
NS = {"__name__": "__tpu_worker__"}

print(f"[worker] pid {os.getpid()} spool {SPOOL}", flush=True)
done_marker = os.path.join(SPOOL, "_worker_alive")
with open(done_marker, "w") as f:
    f.write(str(os.getpid()))

while True:
    jobs = sorted(f for f in os.listdir(SPOOL)
                  if f.endswith(".py") and not os.path.exists(
                      os.path.join(SPOOL, f[:-3] + ".done")))
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    base = os.path.join(SPOOL, name[:-3])
    with open(os.path.join(SPOOL, name)) as f:
        src = f.read()
    if src.strip() == "STOP":
        with open(base + ".out", "w") as f:
            f.write("worker stopping\n")
        with open(base + ".done", "w") as f:
            f.write("ok")
        print("[worker] STOP", flush=True)
        break
    print(f"[worker] running {name}", flush=True)
    buf = io.StringIO()
    old_out, old_err = sys.stdout, sys.stderr
    status = "ok"
    t0 = time.time()
    try:
        sys.stdout = sys.stderr = buf
        exec(compile(src, name, "exec"), NS)
    except BaseException:
        status = "error"
        traceback.print_exc(file=buf)
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    buf.write(f"\n[worker] {name}: {status} in {time.time()-t0:.1f}s\n")
    with open(base + ".out", "w") as f:
        f.write(buf.getvalue())
    with open(base + ".done", "w") as f:
        f.write(status)
    print(f"[worker] {name} -> {status} ({time.time()-t0:.1f}s)", flush=True)
