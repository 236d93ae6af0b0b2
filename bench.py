"""Benchmark: sustained GCUPS of the Pallas splice/frameshift DP kernel
plus the end-to-end north-star metric with device-time accounting.

Prints a cumulative JSON record line after EVERY completed stage (the
last line is the fullest record — a kill mid-run loses only the stages
that had not finished, never the ones already measured), and mirrors
the same record to BENCH_partial.json at the repo root.  Final record:

  {"metric": "nasw_dp_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": R,
   "ext_gcups_reps": [...], "ext_gcups_spread": S,   # run-to-run drift
   "cigar_gcups_device": C,       # CIGAR kernel incl. on-device walk
   "e2e_n_proteins": 2000,        # 200Mb x 2000 whole-genome workload
   "proteins_per_sec_chip": W,    # wall-clock through the dev relay
   "proteins_per_sec_chip_projected": P,  # co-located projection
   "e2e_device_blocked_s"/"e2e_relay_overhead_s"/...: accounting}

Budget: the whole run fits MINIPROT_TPU_BENCH_BUDGET seconds (default
1500); stages that no longer fit are skipped with a note in the record
("stages_skipped") — a partial record beats an empty one.

Cold-start strategy: relay-side Mosaic kernel compiles cost minutes per
shape per process, so the kernel stages first try a live device daemon
(miniprot_tpu.daemon, which holds warm compiled kernels across runs)
over its "bench" RPC; the e2e stage routes mapping through the same
daemon and persists its 200Mb workload + index across runs.  Only when
no daemon is reachable does the run pay the cold path, under the
budget's timeouts.

vs_baseline is the ratio against one CPU core of the reference
implementation running its SSE nasw kernel on the same machine
(measured 0.50-1.05 GCUPS here; re-measured live when the reference
binary is available).  The paper target is >=10x a reference core.
Kernel rates are device-time (queued kernels bounded by one fetch);
the e2e wall number includes the dev container's relay latency, which
the projection (wall - device-blocked + estimated kernel time)
removes — see tools/bigbench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

T0 = time.monotonic()
BUDGET = float(os.environ.get("MINIPROT_TPU_BENCH_BUDGET", "1500"))
REF_CORE_GCUPS_FALLBACK = 0.50  # measured: /tmp/refbench 10000 500 50 1
_REPO = os.path.dirname(os.path.abspath(__file__))
PARTIAL_PATH = os.path.join(_REPO, "BENCH_partial.json")


def remaining() -> float:
    return BUDGET - (time.monotonic() - T0)


class Record:
    """The cumulative benchmark record: printed to stdout and mirrored
    to BENCH_partial.json after every stage, so the permanent record
    survives a kill at any point past the first stage."""

    def __init__(self) -> None:
        self.data: dict = {"metric": "nasw_dp_gcups", "unit": "GCUPS"}
        self.skipped: list[str] = []

    def set(self, **kw) -> None:
        """Update fields without emitting (pre-primary-metric fields)."""
        self.data.update(kw)

    def update(self, **kw) -> None:
        self.data.update(kw)
        self.emit()

    def skip(self, stage: str, why: str) -> None:
        self.skipped.append(f"{stage}: {why}")
        self.data["stages_skipped"] = self.skipped
        print(f"bench: skipping {stage} ({why})", file=sys.stderr)
        if "value" in self.data:
            self.emit()

    def emit(self) -> None:
        line = json.dumps(self.data)
        print(line, flush=True)
        try:
            tmp = PARTIAL_PATH + ".tmp"
            with open(tmp, "w") as f:
                f.write(line + "\n")
            os.replace(tmp, PARTIAL_PATH)
        except OSError:
            pass


def _watchdog(fn, timeout: float, name: str):
    """Run fn on a daemon thread with a deadline: on relay-attached
    backends a call can wedge (block forever, no exception), which must
    surface as TimeoutError so the stage fails instead of the run."""
    import queue as _q
    import threading as _t
    box: _q.Queue = _q.Queue(1)

    def run() -> None:
        try:
            box.put((True, fn()))
        except BaseException as e:
            box.put((False, e))

    _t.Thread(target=run, daemon=True, name=name).start()
    try:
        ok, val = box.get(timeout=timeout)
    except _q.Empty:
        raise TimeoutError(f"{name} exceeded {timeout:.0f}s")
    if not ok:
        raise val
    return val


def _daemon_client():
    """Connect to a live device daemon, or None (respects the engine's
    MINIPROT_TPU_DAEMON=0 opt-out)."""
    if os.environ.get("MINIPROT_TPU_DAEMON") == "0":
        return None
    try:
        from miniprot_tpu.daemon import DaemonClient
        # bench only issues ping/bench RPCs (no collects): one conn
        return DaemonClient.maybe_connect(probe_only=True)
    except Exception:
        return None


def measure_ref_core() -> tuple:
    """Measure the reference nasw kernel on one CPU core if available.
    Returns (gcups, source) with source "measured" or "fallback" so a
    genuine measurement equal to the fallback constant is never
    mislabeled and a silent build/run failure is visible."""
    try:
        if not os.path.exists("/tmp/refbuild/libminiprot.a"):
            if not os.path.isdir("/root/reference"):
                return REF_CORE_GCUPS_FALLBACK, "fallback"
            subprocess.run(
                "mkdir -p /tmp/refbuild && cp -r /root/reference/* /tmp/refbuild/"
                " && make -C /tmp/refbuild -j8 >/dev/null 2>&1",
                shell=True, check=True, timeout=120)
        src = r"""
#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include "nasw.h"
int main() {
    int nl = 10000, al = 500, iters = 50;
    char *ns = malloc(nl), *as = malloc(al);
    ns_opt_t opt; ns_rst_t r;
    srand(7);
    for (int i = 0; i < nl; ++i) ns[i] = "ACGT"[rand()&3];
    for (int i = 0; i < al; ++i) as[i] = "ARNDCQEGHILKMFPSTWYV"[rand()%20];
    /* score-only, x-drop off: the mode directly comparable to the
       Pallas kernel (which also runs score-only over the full
       rectangle in this benchmark) */
    ns_make_tables(1); ns_opt_init(&opt); opt.flag = 0; opt.xdrop = 1<<28;
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    long cells = 0;
    for (int it = 0; it < iters; ++it) {
        ns_rst_init(&r);
        ns_global_gs16b(0, ns, nl, as, al, &opt, 0, &r);
        cells += (long)nl * al;
        if (r.cigar) free(r.cigar);
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    printf("%.4f\n", cells / dt / 1e9);
    return 0;
}
"""
        with open("/tmp/_refgcups.c", "w") as f:
            f.write(src)
        subprocess.run(
            "gcc -O3 -std=gnu99 -I/tmp/refbuild /tmp/_refgcups.c -o /tmp/_refgcups"
            " -L/tmp/refbuild -lminiprot -lz -lm -lpthread",
            shell=True, check=True, timeout=60)
        out = subprocess.run(["/tmp/_refgcups"], capture_output=True, text=True,
                             timeout=120, check=True)
        return float(out.stdout.strip()), "measured"
    except Exception:
        return REF_CORE_GCUPS_FALLBACK, "fallback"


def measure_e2e_big(budget_s: float, ext_gcups: float = 0.0,
                    cig_gcups: float = 0.0) -> dict:
    """End-to-end mapping throughput on the whole-genome-scale workload
    (200Mb x 2000 proteins) via tools/bigbench.py in a subprocess, with
    full device-time accounting: wall proteins/s, device-blocked
    seconds, round trips, relay RTT, DP cell split, and the co-located
    projection (computed from THIS run's measured kernel rates, not
    fallbacks).  The workload matches the README's host-path A/B so the
    host and reference-binary numbers are directly comparable.

    Runs through a warm device daemon (the production deployment shape:
    kernels compiled once, async launcher overlapping relay uploads
    with host work).  Attaches to an already-running daemon when one is
    live (a round-long daemon makes a cold bench run warm); otherwise
    spawns + warms a private one if the budget allows; with neither,
    the run goes direct.  The workload FASTA + built index persist in
    ~/.cache/miniprot_tpu/bigbench across runs."""
    tool = os.path.join(_REPO, "tools", "bigbench.py")
    keep = os.environ.get(
        "MINIPROT_TPU_BENCH_KEEP",
        os.path.expanduser("~/.cache/miniprot_tpu/bigbench"))
    t_end = time.monotonic() + budget_s
    sock = None
    daemon = None
    if os.environ.get("MINIPROT_TPU_DAEMON") != "0":
        from miniprot_tpu.daemon import DaemonClient
        existing = DaemonClient.maybe_connect(probe_only=True)
        if existing is not None:
            sock = existing.path
            existing.close()
        elif budget_s > 900:
            sock = f"/tmp/bench_daemon_{os.getpid()}.sock"
            daemon = subprocess.Popen(
                [sys.executable, "-m", "miniprot_tpu.daemon",
                 "--socket", sock, "--warm"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            deadline = time.monotonic() + min(600.0, budget_s * 0.4)
            while not os.path.exists(sock):
                if daemon.poll() is not None or time.monotonic() > deadline:
                    print("bench: daemon failed to start; e2e runs direct",
                          file=sys.stderr)
                    daemon.terminate()
                    daemon = None
                    sock = None
                    break
                time.sleep(1)
    base = [sys.executable, tool, "--genome-mb", "200", "--n-genes", "2000",
            "--keep", keep, "--keep-index"]
    if ext_gcups:
        base += ["--ext-gcups", str(ext_gcups)]
    if cig_gcups:
        base += ["--cig-gcups", str(cig_gcups)]
    dev_args = list(base)
    if sock is not None:
        dev_args += ["--daemon-sock", sock]

    def run_bb(args, cap=None, env=None):
        t = max(60.0, t_end - time.monotonic())
        if cap is not None:
            t = min(t, cap)
        out = subprocess.run(args, capture_output=True, text=True,
                             timeout=t, env=env)
        if out.returncode != 0:
            raise RuntimeError(f"bigbench failed: {out.stderr[-400:]}")
        return json.loads(out.stdout.strip().splitlines()[-1])

    # the host run must be GENUINELY relay-independent: the container's
    # sitecustomize imports jax into every python process and the relay
    # claim made at import time can hang minutes during a brownout
    # (observed live: a --route host bigbench stuck at 3s CPU for 18
    # min inside the import).  Stripping the hook's trigger makes the
    # child a plain CPU process.
    host_env = dict(os.environ)
    host_env.pop("PALLAS_AXON_POOL_IPS", None)
    host_env["MINIPROT_TPU_DISABLE"] = "1"
    # daemon-attached device clients never need an in-process backend
    # either (batches ship over the socket), so strip the hook from
    # them too: a brownout then cannot stall the client's own import,
    # and the daemon — which holds a healthy long-lived claim — does
    # all device work
    dev_env = None
    if sock is not None:
        dev_env = dict(os.environ)
        dev_env.pop("PALLAS_AXON_POOL_IPS", None)
        dev_env["MINIPROT_TPU_DAEMON_SOCK"] = sock

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    result: dict = {}
    try:
        # host A/B FIRST: relay-independent, so a relay brownout during
        # the device runs can never starve the record of its baseline.
        # (First run also pays the one-time workload gen + index build.)
        # Multi-rep (VERDICT r04 #5): the e2e stages get the kernel
        # stages' discipline — >=3 reps, per-rep values + median in the
        # record, so "relay weather" spread is visible.
        host_reps = []
        try:
            for rep in range(3):
                hrec = run_bb(base + ["--route", "host"], cap=900.0,
                              env=host_env)
                host_reps.append(hrec.get("proteins_per_sec_wall"))
                result["e2e_n_proteins"] = hrec.get("n_proteins")
                result["e2e_host_map_wall_s"] = hrec.get("map_wall_s")
                result["e2e_host_reps"] = host_reps
                result["proteins_per_sec_host"] = med(host_reps)
                if t_end - time.monotonic() < 420 and rep >= 0:
                    break
        except Exception as ex:
            print(f"bench: host e2e failed ({ex!r})", file=sys.stderr)
        # device-forced runs: capped so a wedged relay leaves room for
        # the auto-routed runs below
        chip_reps = []
        for rep in range(3):
            if t_end - time.monotonic() < (400 if rep else 120):
                break
            try:
                rec = run_bb(dev_args, cap=max(
                    120.0, t_end - time.monotonic() - 180.0),
                    env=dev_env)
                if not rec.get("use_tpu"):
                    # the client could not reach a backend (relay
                    # brownout) and ran the host path: recording its
                    # wall as proteins_per_sec_chip would be a lie
                    raise RuntimeError(
                        "device run degraded to the host engine "
                        "(no reachable backend in the client)")
                chip_reps.append(rec.get("proteins_per_sec_wall"))
                result.update({
                    "e2e_n_proteins": rec.get("n_proteins"),
                    "e2e_map_wall_s": rec.get("map_wall_s"),
                    "e2e_daemon": rec.get("daemon", False),
                    "e2e_chip_reps": chip_reps,
                    "proteins_per_sec_chip": med(chip_reps),
                    "proteins_per_sec_chip_projected":
                        rec.get("proteins_per_sec_chip_projected"),
                    "proteins_per_sec_chip_projected_max":
                        rec.get("proteins_per_sec_chip_projected_max"),
                    "e2e_device_blocked_s": rec.get("device_blocked_s"),
                    "e2e_device_exposed_s": rec.get("device_exposed_s"),
                    "e2e_device_round_trips":
                        rec.get("device_round_trips"),
                    "e2e_relay_rtt_s": rec.get("relay_rtt_s"),
                    "e2e_relay_overhead_s": rec.get("relay_overhead_s"),
                    "e2e_daemon_duty_cycle": rec.get("daemon_duty_cycle"),
                    "dp_cells_device_fraction": rec.get("device_fraction"),
                    # relay floor analysis (VERDICT r04 #3)
                    "e2e_flush_rounds": rec.get("flush_rounds"),
                    "e2e_n_waves": rec.get("n_waves"),
                    "e2e_wave_cost_min_s": rec.get("wave_cost_min_s"),
                    "e2e_wave_cost_med_s": rec.get("wave_cost_med_s"),
                    "e2e_wave_cost_p90_s": rec.get("wave_cost_p90_s"),
                    "e2e_relay_floor_s": rec.get("relay_floor_s"),
                })
            except Exception as ex:
                print(f"bench: device e2e failed ({ex!r})",
                      file=sys.stderr)
                break
        # the default (auto-routed) path — with a cached host decision
        # this run is relay-light
        auto_reps = []
        for rep in range(3):
            if t_end - time.monotonic() < (240 if rep else 120):
                break
            try:
                arec = run_bb(dev_args + ["--route", "auto"],
                              env=dev_env)
                auto_reps.append(arec.get("proteins_per_sec_wall"))
                result["e2e_default_reps"] = auto_reps
                result["proteins_per_sec_default"] = med(auto_reps)
                result["e2e_route_choice"] = arec.get("route_choice")
            except Exception as ex:
                print(f"bench: auto-route e2e failed ({ex!r})",
                      file=sys.stderr)
                break
    finally:
        if daemon is not None:
            daemon.terminate()
    return result


def _measure_in_subprocess(timeout: float) -> float:
    """Fresh-interpreter measurement: a failed relay claim at process
    start is fatal for the whole process (the backend never registers),
    so in-process retries cannot recover from it."""
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          "--measure-only"],
                         capture_output=True, text=True, timeout=timeout)
    if out.returncode != 0:
        raise RuntimeError(f"subprocess bench failed: {out.stderr[-500:]}")
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from miniprot_tpu.sysutil import disable_numpy_thp, \
        ensure_responsive_backend
    disable_numpy_thp()
    # subprocess / manual entry points (cold paths)
    if "--measure-only" in sys.argv:
        from miniprot_tpu.benchmarks import measure_ext_gcups
        detail: dict = {}
        g = measure_ext_gcups(detail)
        print(json.dumps(detail), file=sys.stderr)
        print(g)
        return
    if "--cigar-only" in sys.argv:
        from miniprot_tpu.benchmarks import measure_cigar_gcups
        print(json.dumps(measure_cigar_gcups()))
        return
    if "--e2e-only" in sys.argv:
        print(json.dumps(measure_e2e_big(remaining())))
        return

    rec = Record()
    rec.set(bench_budget_s=BUDGET)
    client = _daemon_client()
    rec.set(bench_via_daemon=client is not None)
    if client is not None:
        # provenance: which daemon served the kernel stages
        rec.set(bench_daemon_pid=client.info.get("pid"),
                bench_daemon_uptime_s=client.info.get("uptime_s"),
                bench_daemon_platform=client.info.get("platform"))
    if client is None:
        # no warm daemon: this process must drive the backend itself.
        # If the relay is wedged right now, ride it out for a bounded
        # slice of the budget before failing.  A "wedged" verdict
        # demotes this process to CPU jax — reporting an interpret-mode
        # rate as the chip's GCUPS would be wrong, so fail loudly.
        rides = max(1, min(10, int(remaining() * 0.3 // 90)))
        status = ensure_responsive_backend(retries=rides, retry_wait=90)
        if status == "wedged":
            raise SystemExit(
                "bench: TPU relay wedged (backend init hangs); no honest "
                "device measurement is possible — see BENCH history for "
                "the last live numbers")

    # ---- stage 1: primary metric (ext kernel GCUPS) ----
    gcups = None
    detail: dict = {}
    if client is not None:
        try:
            d = _watchdog(lambda: client.bench("ext"),
                          min(900.0, remaining()), "daemon-bench-ext")
            gcups = d.pop("value")
            detail = d
        except Exception as ex:
            print(f"bench: daemon ext bench failed ({ex!r}); "
                  "falling back to local measurement", file=sys.stderr)
            client = None
            rec.set(bench_via_daemon=False)
    if gcups is None:
        # reaching here after a daemon failure means the wedge guard
        # above never ran for THIS process; a wedged relay would demote
        # local jax to CPU and an interpret-mode rate must never be
        # recorded as the chip's GCUPS — check before measuring locally
        status = ensure_responsive_backend(
            retries=max(1, min(10, int(remaining() * 0.3 // 90))),
            retry_wait=90)
        if status == "wedged":
            raise SystemExit(
                "bench: TPU relay wedged and no daemon; no honest "
                "device measurement is possible")
        watchdog_s = float(os.environ.get("MINIPROT_TPU_BENCH_TIMEOUT",
                                          "420"))
        try:
            from miniprot_tpu.benchmarks import measure_ext_gcups
            gcups = _watchdog(
                lambda: measure_ext_gcups(detail),
                min(watchdog_s, max(120.0, remaining() * 0.5)), "bench-ext")
        except Exception as ex:
            print(f"bench: first attempt failed ({ex!r}); retrying in a "
                  "fresh process", file=sys.stderr)
        while gcups is None and remaining() > 240:
            time.sleep(30)
            try:
                gcups = _measure_in_subprocess(min(1200.0, remaining() - 60))
            except Exception as ex:
                print(f"bench: subprocess attempt failed ({ex!r})",
                      file=sys.stderr)
        if gcups is None:
            raise SystemExit("bench: all measurement attempts failed")
    rec.update(value=round(gcups, 2),
               vs_baseline=round(gcups / REF_CORE_GCUPS_FALLBACK, 2),
               ref_core_gcups=None, ref_core_source="fallback", **detail)

    # ---- stage 2: reference-core baseline (CPU only, ~3 min cold) ----
    if remaining() > 240:
        ref, src = measure_ref_core()
        rec.update(vs_baseline=round(gcups / ref, 2),
                   ref_core_gcups=round(ref, 3), ref_core_source=src)
    else:
        rec.skip("ref_core", f"{remaining():.0f}s left")

    # ---- stage 3: CIGAR kernel ----
    cig = None
    if client is not None and remaining() > 60:
        try:
            cig = _watchdog(lambda: client.bench("cigar"),
                            min(900.0, remaining()), "daemon-bench-cigar")
        except Exception as ex:
            print(f"bench: daemon cigar bench failed ({ex!r}); "
                  "falling back to subprocess", file=sys.stderr)
            client = None
    if cig is None:
        if remaining() > 180:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--cigar-only"],
                    capture_output=True, text=True,
                    timeout=min(900.0, remaining() - 30))
                if out.returncode == 0:
                    cig = json.loads(out.stdout.strip().splitlines()[-1])
                else:
                    print(f"bench: --cigar-only failed: {out.stderr[-300:]}",
                          file=sys.stderr)
            except Exception as ex:
                print(f"bench: --cigar-only failed ({ex!r})", file=sys.stderr)
        else:
            rec.skip("cigar", f"{remaining():.0f}s left")
    if cig:
        rec.update(**cig)

    # ---- stage 4: end-to-end north star ----
    if remaining() > 300:
        try:
            e2e = measure_e2e_big(
                remaining() - 20, ext_gcups=round(gcups, 2),
                cig_gcups=(cig or {}).get("cigar_gcups_device") or 0.0)
            rec.update(**e2e)
        except Exception as ex:
            print(f"bench: e2e failed ({ex!r})", file=sys.stderr)
            rec.skip("e2e", repr(ex))
    else:
        rec.skip("e2e", f"{remaining():.0f}s left")

    # ---- stage 5: capstone record (tools/capstone.py, run offline —
    # the GRCh38-shaped scale A/B takes an hour-plus, so bench merges
    # its persisted record instead of running it) ----
    cap_rec = os.path.expanduser(
        "~/.cache/miniprot_tpu/capstone/record.json")
    if os.path.exists(cap_rec):
        try:
            with open(cap_rec) as f:
                rec.update(**json.load(f))
        except Exception as ex:
            print(f"bench: capstone record unreadable ({ex!r})",
                  file=sys.stderr)
    rec.update(bench_elapsed_s=round(time.monotonic() - T0, 1))


if __name__ == "__main__":
    main()
