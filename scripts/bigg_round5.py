#!/usr/bin/env python3
"""Round-5 whole-genome orchestrator: build(cached) -> bench(TPU,
shard) -> verify(CPU, full table) -> dryrun(8-virtual-device mesh,
unique-anchor oracle check) -> fastq -> CLI end-to-end (--mesh 2x4 vs
1x8 byte-equality) -> BIGG_r05.json.

Every step's rc, wall time, and stderr tail are recorded
UNCONDITIONALLY — r4's bash orchestrator read per-step JSON files that
crashed steps never wrote, so BIGG_r04.json silently omitted the verify
OOM and the dryrun assert failure (VERDICT r4 weak #1). The artifact is
rewritten after each step so a crash of the orchestrator itself still
leaves the completed steps' evidence on disk.

bench runs FIRST after build so the TPU chip frees up early (the
remaining steps are CPU-only).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BIGG_r05.json")
BG = os.path.join(REPO, "scripts", "big_genome.py")
PY = sys.executable
FASTQ = "/tmp/bigg_reads.fastq"

doc = {"date": time.strftime("%Y-%m-%d"), "steps": {}}


def save():
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    os.replace(tmp, OUT)


def step(name, cmd, env_extra=None, timeout=None):
    print(f"[bigg_r5] step {name}: {' '.join(cmd)}", flush=True)
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=timeout, cwd=REPO)
        rc, out_s, err = p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        rc = -9
        out_s = (e.stdout or b"").decode() \
            if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = ((e.stderr or b"").decode()
               if isinstance(e.stderr, bytes) else (e.stderr or "")) \
            + f"\nTIMEOUT after {timeout}s"
    rec = {"rc": rc, "wall_s": round(time.time() - t0, 1),
           "cmd": " ".join(cmd),
           "stderr_tail": err.splitlines()[-15:]}
    for line in reversed(out_s.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec["result"] = json.loads(line)
                break
            except json.JSONDecodeError:
                pass
    if rc != 0:
        rec["stdout_tail"] = out_s.splitlines()[-15:]
    doc["steps"][name] = rec
    save()
    print(f"[bigg_r5] step {name}: rc={rc} in {rec['wall_s']}s",
          flush=True)
    return rec


try:
    meta = json.load(open(f"{REPO}/.bigg/meta.json"))
    doc["genome_bp"] = meta["total_bp"]
except (OSError, KeyError):
    pass

step("build", [PY, BG, "build"], timeout=6 * 3600)
step("bench", [PY, BG, "bench", "--shard-of", "4"], timeout=2 * 3600)
step("verify", [PY, BG, "verify"], timeout=3 * 3600)
step("dryrun", [PY, BG, "dryrun"], timeout=3 * 3600)
step("fastq", [PY, BG, "fastq", "--fastq-out", FASTQ],
     timeout=1 * 3600)

cli_env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
for mesh in ("2x4", "1x8"):
    step(f"cli_mesh_{mesh}",
         [PY, "-m", "find_circ2_tpu.cli.main", "find_circ", FASTQ,
          "--reads-format", "fastq", "-x", f"{REPO}/.bigg",
          "-o", f"/tmp/bigg_cli_{mesh}.bed",
          "-s", f"/tmp/bigg_cli_{mesh}.stats", "--mesh", mesh,
          "--platform", "cpu", "-n", "bigg"],
         env_extra=cli_env, timeout=3 * 3600)

try:
    a = open("/tmp/bigg_cli_2x4.bed", "rb").read()
    b = open("/tmp/bigg_cli_1x8.bed", "rb").read()
    doc["steps"]["cli_equal"] = {
        "byte_identical": a == b,
        "rows": a.count(b"\n"),
    }
except OSError as e:
    doc["steps"]["cli_equal"] = {"error": str(e)}

ok = all(s.get("rc", 1) == 0 for n, s in doc["steps"].items()
         if n != "cli_equal") \
    and doc["steps"].get("cli_equal", {}).get("byte_identical") is True
dr = doc["steps"].get("dryrun", {})
doc["conclusions"] = {
    "all_steps_ok": ok,
    "uint32_above_2_31_proven": bool(
        dr.get("rc") == 0
        and dr.get("result", {}).get("min_start", 0) > 2 ** 31),
    "note": ("dryrun plants reads whose anchor 20-mers are genome-wide "
             "unique (relocation impossible) and asserts sharded-device "
             "== oracle == planted coordinates, all > 2^31"),
}
save()
print(json.dumps(doc["conclusions"]))
