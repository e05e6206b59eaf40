"""Backend health probing and hang-surviving supervision.

The tunneled TPU backend can WEDGE: ``jax.devices()`` still answers (or, in
the worst observed case, also hangs) while every compute dispatch blocks
forever.  Nothing client-side unwedges it, a hung C call cannot be
interrupted from Python, and the reference has no notion of this failure
mode at all (its 3-day V100 SLURM job simply dies and is resubmitted by
hand).  This module productizes the recovery pattern that kept round-4
training alive through two multi-hour wedges:

* :func:`probe_backend` — run one tiny device computation in a SUBPROCESS
  with a hard timeout, so a wedged backend can never hang the caller.
* :class:`Heartbeat` — a liveness file the :class:`~.loop.Trainer` touches
  after every fused-step chunk (enable by setting the ``PRDISAGG_HEARTBEAT``
  env var to a path; zero overhead when unset).
* :func:`supervise` — run a training command as a child process group,
  kill the group when the heartbeat goes stale, optionally wait for the
  backend to answer probes again, and relaunch.  Paired with the Trainer's
  forced Orbax checkpoints (`maybe_resume`), a wedge costs at most
  ``stall_timeout_s`` plus the un-checkpointed epochs — not the run.

SURVEY.md §5 "failure detection" row; there is no reference counterpart
(closest: the NaN abort at gan_train_cwgangp_pixelnorm.py:487-488, which
covers diverging losses but not a dead accelerator).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from dataclasses import dataclass
from typing import Optional, Sequence

_PROBE_SRC = """
import os, time
p = {platform!r}
if p:
    os.environ["JAX_PLATFORMS"] = p
import jax
if p:
    # sitecustomize may pre-import jax with another platform latched; the
    # config update is what actually wins after import
    jax.config.update("jax_platforms", p)
# remote compiles through the tunnel take 30s-10min cold: without the
# persistent cache, a healthy-but-cold backend would time the probe out
# and read as the wedge signature (false positive) on every attempt
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/prdisagg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
t0 = time.perf_counter()
x = jax.device_put(np.ones(8, np.float32))
s = float(jax.numpy.sum(x))  # host fetch: the only reliable sync
print("PROBE_OK", s, time.perf_counter() - t0)
"""


def probe_backend(platform: Optional[str] = None,
                  timeout_s: float = 60.0) -> dict:
    """One tiny device_put + reduce + host fetch in a fresh subprocess.

    Returns ``{"ok": bool, "latency_s": float|None, "detail": str}``.
    ``ok=False`` with ``detail="timeout"`` is the wedge signature (the
    subprocess is killed; the parent never blocks past ``timeout_s``).
    ``platform=None`` probes whatever platform the environment selects.
    """
    src = _PROBE_SRC.format(platform=platform)
    t0 = time.perf_counter()
    try:
        res = subprocess.run(
            [sys.executable, "-c", src],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "latency_s": None, "detail": "timeout"}
    out = (res.stdout or "") + (res.stderr or "")
    for line in (res.stdout or "").splitlines():
        if line.startswith("PROBE_OK"):
            parts = line.split()
            lat = float(parts[2]) if len(parts) > 2 else \
                time.perf_counter() - t0
            return {"ok": True, "latency_s": round(lat, 4), "detail": "ok"}
    return {"ok": False, "latency_s": None,
            "detail": f"rc={res.returncode}: {out.strip()[-500:]}"}


class Heartbeat:
    """Liveness file: `beat()` bumps the mtime; `age_s()` reads staleness.

    The Trainer calls :meth:`beat` once per fused-step chunk (a host-side
    touch, ~µs — the chunk itself is 100 device steps).  A missing file
    reads as infinitely stale only after ``started_s`` grace (cold compiles
    through the tunnel are legitimately ~26 min silent).
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def beat(self) -> None:
        # O_CREAT + utime instead of rewrite: atomic enough for an mtime
        # channel, and never leaves a half-written file
        with open(self.path, "a"):
            os.utime(self.path, None)

    def age_s(self) -> Optional[float]:
        """Seconds since the last beat, or None if no beat yet."""
        try:
            return max(0.0, time.time() - os.stat(self.path).st_mtime)
        except OSError:
            return None

    @staticmethod
    def from_env() -> Optional["Heartbeat"]:
        p = os.environ.get("PRDISAGG_HEARTBEAT")
        return Heartbeat(p) if p else None


_env_hb: Optional[Heartbeat] = None


def beat_if_enabled() -> None:
    """Touch the PRDISAGG_HEARTBEAT liveness file if the env var is set.

    Call-site sugar for long host-side chunk loops (the eval battery's CRPS/
    LSD/statistics stages run 20-50 min between Trainer beats — without
    their own beats a supervisor would misread a healthy battery as a
    wedge).  No-op (one dict lookup) when the env var is unset."""
    global _env_hb
    p = os.environ.get("PRDISAGG_HEARTBEAT")
    if not p:
        return
    if _env_hb is None or _env_hb.path != p:
        _env_hb = Heartbeat(p)
    _env_hb.beat()


def acquire_workdir_lock(workdir: str, name: str = ".lock"):
    """Exclusive advisory lock on a working directory, held for the caller's
    process lifetime (the fd is returned and must be kept referenced).

    Two instances of a resumable protocol sharing a workdir corrupt each
    other (observed live: a duplicate battery relaunch raced the first on
    checkpoints, hist.csv, and the stage cache).  flock auto-releases when
    the last fd on the open file description closes — on ANY process death,
    including SIGKILL from a supervisor — so a crashed run never wedges the
    lock.  Caveat: the lock lives on the open file DESCRIPTION, so it IS
    preserved across fork/exec if the fd leaks into a child; Python os.open
    fds are non-inheritable by default (PEP 446), which is what keeps
    children from holding it — do not pass this fd via pass_fds /
    close_fds=False to a long-lived child, or the child will keep the
    workdir locked after the parent dies.

    Raises RuntimeError naming the holder when already locked.
    """
    import fcntl

    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, name)
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        holder = ""
        try:
            holder = os.read(fd, 64).decode(errors="replace").strip()
        except OSError:
            pass
        os.close(fd)
        raise RuntimeError(
            f"workdir {workdir} is locked by another running instance"
            + (f" (pid {holder})" if holder else "")
            + "; refusing to run two protocols in one workdir")
    os.ftruncate(fd, 0)
    os.write(fd, str(os.getpid()).encode())
    return fd


@dataclass
class SuperviseResult:
    returncode: int
    restarts: int
    stalls: int
    wall_s: float


def _cpu_seconds(pid: int) -> Optional[float]:
    """User+system CPU seconds of one process from /proc (Linux)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        # fields 14/15 of stat are utime/stime; after stripping pid+comm
        # they land at indices 11/12
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


def supervise(
    argv: Sequence[str],
    heartbeat_path: str,
    stall_timeout_s: float = 900.0,
    startup_timeout_s: Optional[float] = None,
    max_restarts: int = 3,
    poll_s: float = 10.0,
    busy_cpu_fraction: float = 0.2,
    probe_platform: Optional[str] = None,
    probe_on_stall: bool = True,
    probe_timeout_s: float = 60.0,
    probe_interval_s: float = 120.0,
    probe_max_wait_s: float = 6 * 3600.0,
    log=print,
) -> SuperviseResult:
    """Run ``argv`` under heartbeat supervision; restart on stall.

    The child gets ``PRDISAGG_HEARTBEAT=heartbeat_path`` in its environment
    (the Trainer beats automatically) and runs in its own process group so
    a stall kill reaps every descendant.  A stall is declared when the
    heartbeat file is older than ``stall_timeout_s`` (or, before the first
    beat, when the child has been silent ``startup_timeout_s`` — default
    ``4 * stall_timeout_s`` to allow cold compiles).  After a stall kill,
    if ``probe_on_stall``, the relaunch waits until :func:`probe_backend`
    succeeds (a wedged backend would hang the restarted child identically —
    observed: killing the client never unwedges the server).

    A heartbeat-silent child that is BUSY is not a stall: local compiles
    and long device chunks can legitimately go beat-less for tens of
    minutes, but they burn host CPU (observed ~97%), while a wedged client
    blocks in an RPC wait at ~0%.  A kill therefore also requires the
    child's recent CPU utilisation to be below ``busy_cpu_fraction``
    (measured over the trailing stall window from /proc; direct child only
    — the exec-chain keeps the pid).  Set 0.0 to kill on silence alone.
    Caveat: REMOTE compiles (the tunneled TPU compiles server-side) also
    block at ~0% and are indistinguishable from the wedge — size
    ``stall_timeout_s`` above the largest expected mid-run remote compile
    (small jit programs recompile in ~1-2 min; only the fused train step
    is the ~26-min cold case, and it sits behind the startup grace).

    A clean child exit (rc == 0) ends supervision; a nonzero exit is
    returned as-is without restart (crashes are the caller's bug — only
    HANGS are the backend's).  Restarts resume training via the Trainer's
    ``maybe_resume`` as long as the command's workdir is stable.
    """
    if startup_timeout_s is None:
        startup_timeout_s = 4 * stall_timeout_s
    hb = Heartbeat(heartbeat_path)
    env = dict(os.environ, PRDISAGG_HEARTBEAT=heartbeat_path)
    restarts = stalls = 0
    t_all = time.time()

    # The child lives in its own process group (required for stall kills to
    # reap descendants), so an outer `timeout`/TERM on the supervisor would
    # ORPHAN it — forward termination explicitly.  Handlers are installed
    # ONCE, BEFORE the first launch: registering after Popen left a window
    # where a TERM killed the supervisor with the default handler and the
    # freshly-launched child kept running detached.
    child = None

    def _forward(sig, frame):
        if child is not None:
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        raise SystemExit(128 + sig)

    old_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old_handlers[sig] = signal.signal(sig, _forward)
        except ValueError:  # not the main thread: no forwarding
            pass

    try:
        while True:
            # stale beats from a previous attempt must not mask a startup hang
            try:
                os.remove(heartbeat_path)
            except OSError:
                pass
            t_start = time.time()
            log(f"[supervise] launch (attempt {restarts + 1}): "
                f"{' '.join(argv)}", flush=True)
            child = subprocess.Popen(list(argv), env=env, start_new_session=True)
            stalled = False
            cpu_samples: list = []  # (wall_t, cpu_seconds) trail for busy check
            last_busy_log = 0.0
            while True:
                rc = child.poll()
                if rc is not None:
                    break
                now = time.time()
                age = hb.age_s()
                silent = (now - t_start if age is None else age)
                limit = startup_timeout_s if age is None else stall_timeout_s
                cpu = _cpu_seconds(child.pid)
                if cpu is not None:
                    cpu_samples.append((now, cpu))
                    # keep one APPLICABLE window of history: averaging over
                    # the (4x larger) startup window after beats began would
                    # let pre-wedge CPU mask a wedge for multiples of the
                    # stall timeout
                    horizon = now - limit
                    while len(cpu_samples) > 2 and cpu_samples[1][0] < horizon:
                        cpu_samples.pop(0)
                if silent > limit:
                    busy = None
                    if busy_cpu_fraction > 0 and len(cpu_samples) >= 2:
                        (t0c, c0), (t1c, c1) = cpu_samples[0], cpu_samples[-1]
                        if t1c > t0c:
                            busy = (c1 - c0) / (t1c - t0c)
                    if busy is not None and busy >= busy_cpu_fraction:
                        # silent but computing (compile / long device chunk):
                        # not the wedge signature (blocked RPC at ~0% CPU)
                        if now - last_busy_log > 300:
                            last_busy_log = now
                            log(f"[supervise] heartbeat silent {silent:.0f}s "
                                f"but child busy ({busy:.0%} CPU); not a "
                                f"stall", flush=True)
                        time.sleep(poll_s)
                        continue
                    stalled = True
                    phase = "startup" if age is None else "step"
                    log(f"[supervise] {phase} stall: heartbeat silent "
                        f"{silent:.0f}s > {limit:.0f}s"
                        + (f", child idle ({busy:.0%} CPU)"
                           if busy is not None else "")
                        + f"; killing process group {child.pid}", flush=True)
                    try:
                        os.killpg(child.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    child.wait()
                    break
                time.sleep(poll_s)

            if not stalled:
                log(f"[supervise] child exited rc={child.returncode} after "
                    f"{restarts} restart(s)", flush=True)
                return SuperviseResult(child.returncode, restarts, stalls,
                                       time.time() - t_all)

            stalls += 1
            if restarts >= max_restarts:
                log(f"[supervise] giving up: {stalls} stall(s), "
                    f"max_restarts={max_restarts} exhausted", flush=True)
                return SuperviseResult(-1, restarts, stalls, time.time() - t_all)

            if probe_on_stall:
                t_probe = time.time()
                while True:
                    r = probe_backend(probe_platform, timeout_s=probe_timeout_s)
                    if r["ok"]:
                        log(f"[supervise] backend healthy "
                            f"(probe {r['latency_s']}s); relaunching", flush=True)
                        break
                    waited = time.time() - t_probe
                    if waited > probe_max_wait_s:
                        log(f"[supervise] backend still down after "
                            f"{waited / 3600:.1f}h of probes; giving up",
                            flush=True)
                        # restarts counts RELAUNCHES that actually happened —
                        # this exit never relaunched after the stall kill
                        return SuperviseResult(-1, restarts, stalls,
                                               time.time() - t_all)
                    log(f"[supervise] backend unhealthy ({r['detail']}); "
                        f"retry in {probe_interval_s:.0f}s", flush=True)
                    time.sleep(probe_interval_s)
            restarts += 1
    finally:
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
