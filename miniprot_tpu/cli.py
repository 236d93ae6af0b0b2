"""Command-line interface, flag-compatible with the reference tool.

Mirrors main.c:101-219 (option letters, long options, k/M/G number
suffixes, same defaults and derived-option behavior).
"""

from __future__ import annotations

import os
import sys

from . import MP_VERSION, tables
from .index import Index
from .options import (f32,
                      F_GFF, F_GTF, F_NO_ALIGN, F_NO_CS, F_NO_PAF,
                      F_NO_PRE_CHAIN, F_SHOW_RESIDUE, F_SHOW_TRANS,
                      F_SHOW_UNMAP, IdxOpt, MapOpt)
from .pipeline import map_file


def parse_num(s: str) -> int:
    """k/M/G-suffixed number (mp_parse_num, main.c:36-51)."""
    mult = 1.0
    t = s
    for suf, m in (("G", 1e9), ("g", 1e9), ("M", 1e6), ("m", 1e6), ("K", 1e3), ("k", 1e3)):
        if suf in t:
            idx = t.index(suf)
            t = t[:idx]
            mult = m
            break
    return int(float(t) * mult + 0.499)


USAGE = """Usage: miniprot-tpu [options] <ref.fa> <query.faa> [...]
Options:
  Indexing:
    -k INT       k-mer size [6]
    -M INT       modimisers bit (sample rate = 1/2**M) [1]
    -L INT       min ORF length to index [30]
    -T INT       NCBI translation table (1 through 33) [1]
    -b INT       bits per block [8]
    -d FILE      save index to FILE []
  Mapping:
    -S           no splicing (applying -G1k -J1k -e1k)
    -c NUM       max k-mer occurrence [20000]
    -G NUM       max intron size; override -I [200k]
    -I           set max intron size to 3.6*sqrt(refLen)
    -w FLOAT     weight of log gap penalty [0.75]
    -n NUM       minimum number of syncmers in a chain [3]
    -m NUM       min chaining score [0]
    -l INT       k-mer size for the second round of chaining [5]
    -e NUM       max extension for 2nd round of chaining and alignment [10000]
    -p FLOAT     min secondary-to-primary score ratio [0.7]
    -N NUM       consider at most INT secondary alignments [30]
  Alignment:
    -O INT       gap open penalty [11]
    -E INT       gap extension (a k-long gap costs O+k*E) [1]
    -J INT       intron open penalty [29]
    -F INT       penalty for frameshifts or in-frame stop codons [23]
    -C FLOAT     weight of splice penalty; 0 to ignore splice signals [1]
    -B INT       bonus score for alignment reaching query ends [5]
    -j INT       splice model: 2=vertebrate/insect, 1=general, 0=none [1]
    --spsc=FILE  splice score file in format "ctg offset +|- D|A score" []
    --spsc0=INT  splice score for sites not in --spsc [-7]
  Input/output:
    -t INT       number of threads [4]
    --gff        output in the GFF3 format
    --gtf        basic GTF output without detailed alignment
    --aln        output residue alignment
    --trans      output translated protein sequences (skipping frameshift)
    -P STR       prefix for IDs in GFF3 [MP]
    -u           print unmapped query proteins in PAF
    --outn=NUM   output up to min{NUM,-N} alignments per query [1000]
    --outs=FLOAT output if score at least FLOAT*bestScore [0.99]
    --outc=FLOAT output if at least FLOAT fraction of query is aligned [0.1]
    -K NUM       query batch size [2M]
  TPU-build extensions:
    --tpu            force the TPU alignment engine (default: auto —
                     engaged when a TPU backend is live, then a measured
                     routing probe keeps whichever engine is faster; set
                     MINIPROT_TPU_ROUTE_PROBE=0 to skip the probe)
    --no-tpu         host engine only (also: MINIPROT_TPU_DISABLE=1)
    --tpu-sketch     index-build sketching on the accelerator (experimental;
                     measured 37x slower than the host build through a relay
                     attachment — docs/ROUND5_NOTES.md #7)
    --profile        per-stage timers + DP cell/GCUPS counters to stderr
    --profile-trace=DIR  write a jax profiler device trace to DIR
    -o FILE      write output to FILE instead of stdout
    --resume     with -o: checkpoint after each mini-batch and resume an
                 interrupted run from the last complete batch
  Multi-host (data-parallel shards over a shared --spool-dir):
    --shards INT     total number of shard processes [1]
    --shard-id INT   this process's shard index (0 emits the merge) [0]
    --spool-dir DIR  shared directory for shard spools; an existing
                 complete spool is a checkpoint (that shard is skipped),
                 so use a fresh DIR when inputs or options change
"""

_LONG_OPTS = {
    "tpu", "no-tpu", "tpu-sketch", "gff", "gff-only", "gtf", "aln", "trans",
    "no-cs", "no-pre-chain",
    "version", "no-kalloc", "profile", "dbg-qname", "dbg-no-refine",
    "dbg-aflt", "dbg-anchor", "dbg-chain", "resume",
}
_LONG_OPTS_ARG = {
    "xdrop", "outn", "gff-delim", "J2", "outs", "max-skip", "max-intron-out",
    "outc", "ie-coef", "spsc", "spsc0", "spsc-max", "profile-trace",
    "shards", "shard-id", "spool-dir",
}
_SHORT_ARG = "kMLslbTtdcnmKpNOEJCFGegBPwjo"


def main(argv: list[str] | None = None) -> int:
    """CLI entry point; always returns an exit code.

    argv=None means the process is ours (console script / python -m):
    the exit path may then hard-exit to sidestep teardown aborts from
    threads marooned in a wedged device relay.  Callers that pass argv
    explicitly (tests, embedding apps) always get a normal return."""
    owns = argv is None
    r = _run(sys.argv[1:] if argv is None else argv, server_parse=False,
             owns_process=owns)
    assert isinstance(r, int)
    return r


def load_for_server(argv: list[str]) -> tuple | int:
    """Parse options and load the index like the CLI, but stop before
    mapping: returns (index, mapopt, n_threads, use_tpu) for
    miniprot_tpu.server, or an int exit code on a usage error."""
    return _run(argv, server_parse=True)


# set when the backend probe timed out: its daemon thread is still
# blocked inside backend init and interpreter teardown can abort with
# "exception not rethrown" even though the run finished on the host
# engine — the exit path below hard-exits when this is set
_PROBE_WEDGED = False


def tpu_live(timeout: float | None = None) -> bool:
    """True when device mapping is available: a reachable warm daemon
    (preferred — the client then never initializes a backend, so a
    relay brownout in THIS process cannot block the device path), or a
    usable in-process TPU backend.

    The backend check delegates to the package-wide guarded probe
    (kernels.probe_backend_guarded): one bounded, cached backend-init
    attempt per process, so a wedged relay degrades the auto-TPU
    default to the host engine instead of hanging the run.
    MINIPROT_TPU_PROBE_TIMEOUT overrides the default 60 s (0 disables
    the timeout)."""
    if os.environ.get("MINIPROT_TPU_DAEMON") != "0":
        try:
            from .daemon import DaemonClient
            c = DaemonClient.maybe_connect(probe_only=True)
            if c is not None:
                # only a daemon that actually OWNS an accelerator
                # counts: an interpret-mode daemon (serving without a
                # TPU, "tests only") would swallow production batches
                # ~10^4x slower than the host engine
                plat = c.info.get("platform")
                c.close()
                if plat in ("tpu", "axon"):
                    return True
        except Exception:
            pass
    from .kernels import probe_backend_guarded
    return probe_backend_guarded(timeout)


def _run(argv: list[str], server_parse: bool, owns_process: bool = False):
    from .sysutil import disable_numpy_thp
    disable_numpy_thp()
    want_tpu = None  # auto: engage the engine when a TPU is live
    if "--no-tpu" in argv or os.environ.get("MINIPROT_TPU_DISABLE") == "1":
        want_tpu = False
    elif "--tpu" in argv:
        want_tpu = True
    if want_tpu is not False:
        # Initialize the accelerator backend before any slow host work:
        # on relay-attached devices (axon) the claim made at process
        # start expires if the first backend touch comes seconds later,
        # and a late first init then fails for the process's lifetime.
        live = tpu_live()
        if want_tpu and not live:
            sys.stderr.write("WARNING: TPU backend unavailable; "
                             "--tpu will fall back to the host engine\n")
        if want_tpu is None:
            # auto: engage the device engine, but let map_file's
            # measured routing probe demote to the host engine when the
            # host is actually faster here (pipeline._route_probe)
            want_tpu = "auto" if live else False
    io = IdxOpt()
    mo = MapOpt()
    dbg0_use_tpu = want_tpu
    n_threads = 4
    fn_idx = None
    fn_spsc = None
    fn_out = None
    resume = False
    n_shards, shard_id, spool_dir = 1, 0, None
    set_I = set_G = keep_io = 0
    pos: list[str] = []
    dbg: dict = {"use_tpu": dbg0_use_tpu}

    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg == "--":
            pos.extend(argv[i + 1:])
            break
        if arg.startswith("--"):
            body = arg[2:]
            key, _, val = body.partition("=")
            if key in _LONG_OPTS_ARG and not val:
                i += 1
                val = argv[i] if i < len(argv) else ""
            if key == "gff":
                mo.flag |= F_GFF
            elif key == "gff-only":
                mo.flag |= F_GFF | F_NO_PAF
            elif key == "gtf":
                mo.flag |= F_GTF
            elif key == "aln":
                mo.flag |= F_SHOW_RESIDUE
            elif key == "trans":
                mo.flag |= F_SHOW_TRANS
            elif key == "no-cs":
                mo.flag |= F_NO_CS
            elif key == "resume":
                resume = True
            elif key == "no-pre-chain":
                mo.flag |= F_NO_PRE_CHAIN
            elif key == "xdrop":
                mo.xdrop = int(val)
            elif key == "outn":
                mo.out_n = parse_num(val)
            elif key == "outs":
                mo.out_sim = f32(val)
            elif key == "outc":
                mo.out_cov = f32(val)
            elif key == "gff-delim":
                mo.gff_delim = ord(val[0])
            elif key == "J2":
                mo.io_end = int(val)
                keep_io = 1
            elif key == "max-skip":
                mo.max_chn_max_skip = parse_num(val)
            elif key == "max-intron-out":
                mo.max_intron_flank = (parse_num(val) + 1) // 2
            elif key == "ie-coef":
                mo.ie_coef = f32(val)
            elif key == "spsc":
                fn_spsc = val
            elif key == "spsc0":
                s = int(val)
                mo.sp_null_bonus = s if s < 0 else -s
            elif key == "spsc-max":
                mo.sp_max_bonus = int(val)
            elif key == "shards":
                n_shards = int(val)
            elif key == "shard-id":
                shard_id = int(val)
            elif key == "spool-dir":
                spool_dir = val
            elif key == "version":
                print(MP_VERSION)
                return 0
            elif key == "dbg-no-refine":
                dbg["no_refine"] = True
            elif key == "dbg-qname":
                dbg["qname"] = True
            elif key == "dbg-anchor":
                dbg["anchor"] = True
            elif key == "dbg-chain":
                dbg["chain"] = True
            elif key == "dbg-aflt":
                dbg["more_dp"] = True
            elif key == "tpu":
                dbg["use_tpu"] = True
            elif key == "tpu-sketch":
                dbg["tpu_sketch"] = True
            elif key == "profile":
                from . import sysutil
                sysutil.profiler.enabled = True
            elif key == "profile-trace":
                dbg["profile_trace"] = val
            elif key in _LONG_OPTS:
                pass  # accepted no-ops (--no-kalloc etc.)
            else:
                from . import sysutil
                sysutil.warn("unrecognized option: %s", arg)
            i += 1
            continue
        if arg.startswith("-") and len(arg) > 1:
            c = arg[1]
            if c in _SHORT_ARG:
                val = arg[2:] if len(arg) > 2 else argv[i + 1]
                if len(arg) == 2:
                    i += 1
            else:
                val = ""
            if c == "k":
                io.kmer = int(val)
            elif c == "M":
                io.mod_bit = int(val)
            elif c == "L":
                io.min_aa_len = int(val)
            elif c == "b":
                io.bbit = int(val)
            elif c == "T":
                io.trans_code = int(val)
            elif c == "d":
                fn_idx = val
            elif c == "t":
                n_threads = int(val)
            elif c == "l":
                mo.kmer2 = int(val)
            elif c == "c":
                mo.max_occ = parse_num(val)
            elif c == "G":
                mo.bw = mo.max_intron = parse_num(val)
                set_G = 1
            elif c == "I":
                set_I = 1
            elif c == "n":
                mo.min_chn_cnt = parse_num(val)
            elif c == "m":
                mo.min_chn_sc = parse_num(val)
            elif c == "K":
                mo.mini_batch_size = parse_num(val)
            elif c == "p":
                mo.pri_ratio = f32(val)
            elif c == "N":
                mo.best_n = parse_num(val)
            elif c == "S":
                mo.set_no_splice()
                set_G = 1
            elif c == "A":
                mo.flag |= F_NO_ALIGN
            elif c == "O":
                mo.go = int(val)
            elif c == "E":
                mo.ge = int(val)
            elif c == "J":
                mo.io = int(val)
                keep_io = 1
            elif c == "C":
                mo.sp_scale = f32(val)
            elif c == "F":
                mo.set_fs(int(val))
            elif c == "B":
                mo.end_bonus = int(val)
            elif c == "e":
                mo.max_ext = parse_num(val)
            elif c == "o":
                fn_out = val
            elif c == "P":
                mo.gff_prefix = val
            elif c == "u":
                mo.flag |= F_SHOW_UNMAP
            elif c == "w":
                mo.chn_coef_log = f32(val)
            elif c == "j":
                mo.sp_model = int(val)
            elif c == "g":
                mo.max_gap = parse_num(val)
            elif c == "s":
                print("Option '-s' is deprecated.", file=sys.stderr)
            else:
                from . import sysutil
                sysutil.warn("unrecognized option: %s", arg)
            i += 1
            continue
        pos.append(arg)
        i += 1

    try:
        mo.check()
    except ValueError as ex:
        from . import sysutil
        sysutil.error("%s", ex)
        return 1
    if not pos or (len(pos) == 1 and fn_idx is None and not server_parse):
        sys.stderr.write(USAGE)
        return 1
    try:
        tables.get_tables(io.trans_code)
    except ValueError:
        from . import sysutil
        sysutil.error("failed to find translation table %d", io.trans_code)
        return 1

    mi = Index.load(pos[0], io, n_threads=n_threads,
                use_tpu=bool(dbg.get("tpu_sketch")))
    if set_I and not set_G:
        mo.set_max_intron(mi.nt.l_seq)
    if fn_idx is not None:
        mi.dump(fn_idx)
    if fn_spsc is not None:
        # mp_set_spsc (index.c:239-248)
        if not keep_io:
            mo.io += 10
            mo.io_end += 10
        max_sc = (mo.io + 1) // 2 - 1
        max_sc = min(max_sc, mo.io - mo.go, mo.sp_max_bonus)
        mi.nt.read_spsc(fn_spsc, max_sc)
    if len(pos) > 1:
        from . import sysutil
        sysutil.log("main", mi.print_stat(mo.max_occ))
    if server_parse:  # miniprot_tpu.server: hand back the loaded state
        return (mi, mo, n_threads, bool(dbg.get("use_tpu")))
    trace_dir = dbg.get("profile_trace")
    if trace_dir:
        try:  # device trace (jax profiler); unsupported backends warn
            import jax
            jax.profiler.start_trace(trace_dir)
        except Exception as ex:
            from . import sysutil
            sysutil.warn("profiler trace unavailable: %s", ex)
            trace_dir = None
    out = sys.stdout
    ckpt = None
    if n_shards > 1 or spool_dir is not None:
        # multi-host data-parallel run (parallel/runner.py): each shard
        # is an independent CLI process over a shared --spool-dir; the
        # shard-0 process performs the ordered k-way merge emit.
        from . import sysutil
        if spool_dir is None:
            sysutil.error("--shards requires --spool-dir")
            return 1
        if not 0 <= shard_id < n_shards:
            sysutil.error("--shard-id must be in [0, --shards)")
            return 1
        if len(pos) != 2:
            sysutil.error("--shards supports exactly one query file")
            return 1
        if resume:
            sysutil.error("--shards uses spool files as checkpoints; "
                          "rerun failed shards instead of --resume")
            return 1
        os.makedirs(spool_dir, exist_ok=True)
        if fn_out is not None and shard_id == 0:
            out = open(fn_out, "w")
        from .parallel.runner import map_file_multihost
        try:
            map_file_multihost(mi, pos[1], mo, shard_id, n_shards,
                               spool_dir, out, resume=True,
                               use_tpu=bool(dbg.get("use_tpu")))
        finally:
            if out is not sys.stdout:
                out.close()
        sysutil.log("main", "Real time: %.3f sec; CPU: %.3f sec; "
                    "Peak RSS: %.3f GB", sysutil.realtime(),
                    sysutil.cputime(), sysutil.peakrss_gb())
        return 0
    if resume and fn_out is None:
        from . import sysutil
        sysutil.error("--resume requires -o FILE")
        return 1
    if resume and len(pos) > 2:
        from . import sysutil
        sysutil.error("--resume supports a single query file")
        return 1
    if fn_out is not None:
        mode = "r+" if resume and os.path.exists(fn_out) else "w"
        out = open(fn_out, mode)
        if resume:
            ckpt = fn_out + ".ckpt"
            if mode == "w" and os.path.exists(ckpt):
                os.remove(ckpt)  # stale journal without its output file
    try:
        for fn in pos[1:]:
            map_file(mi, fn, mo, n_threads, out=out,
                     use_tpu=dbg.get("use_tpu") or False, dbg=dbg, ckpt=ckpt)
    finally:
        if out is not sys.stdout:
            out.close()
        if trace_dir:
            try:
                import jax
                jax.profiler.stop_trace()
            except Exception:
                pass
    from . import sysutil
    from . import MP_VERSION as _V
    sysutil.log("main", "Version: %s (miniprot_tpu %s)", _V, __import__("miniprot_tpu").__version__)
    sysutil.log("main", "CMD: miniprot-tpu %s", " ".join(argv))
    sysutil.log("main", "Real time: %.3f sec; CPU: %.3f sec; Peak RSS: %.3f GB",
                sysutil.realtime(), sysutil.cputime(), sysutil.peakrss_gb())
    sysutil.profiler.report()
    import sys as _sys
    dev = _sys.modules.get("miniprot_tpu.device")
    if owns_process and (
            _PROBE_WEDGED or (dev is not None and getattr(dev, "WEDGED", False))):
        # a probe or collect thread is still wedged inside the device
        # runtime; normal teardown would join/kill it and can abort the
        # process after all useful work is done — exit hard instead.
        # Only when the process is ours (argv=None entry): an in-process
        # caller (pytest!) must never be silently terminated.
        _sys.stdout.flush()
        _sys.stderr.flush()
        os._exit(0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
