"""Hardware certification of the quantized mosaic uplink at 16,384².

VERDICT r4 #5: the ``upload_dtype='uint16'`` claims must be evidence,
not README prose.  This driver runs ON THE REAL TPU (stop the
.tpuworker first — the tunnel serves one process at a time):

1. plain-f32 trio mosaic           (subprocess, exact transport)
2. quantized trio mosaic + ckpt    (subprocess, lattice sidecar path)
3. quantized trio mosaic, SIGKILLed mid-stream (subprocess)
4. resume of (3) from its tile checkpoint      (fresh subprocess)
5. jax-free parent: margin audit of every (1)-vs-(2) class flip
   (tools.quplink_audit — f64 reference-ladder margins vs the analytic
   quantization bound) and a byte-exact (2)-vs-(4) comparison
   (kill+resume determinism), written to QUPLINK_CERT.json.

Usage:  python tools/quplink_cert.py            # full certification
        python tools/quplink_cert.py --child X  # internal
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/tmp/qcert16k"
N = 16384
KW = dict(lookup_pixels=50, windows=5, gi_radius=3, tile_size=4096,
          cellsize=1)
PRODUCTS = ("geomorphons", "objects", "moran")
_DT = {"geomorphons": np.uint8, "objects": np.bool_,
       "moran": np.float32}


def _input_path():
    return os.path.join(SCRATCH, "Z.f32")


def ensure_input():
    os.makedirs(SCRATCH, exist_ok=True)
    p = _input_path()
    if not (os.path.exists(p)
            and os.path.getsize(p) == N * N * 4):
        rng = np.random.default_rng(0)
        Z = np.lib.format.open_memmap  # noqa: F841 (doc: raw memmap)
        mm = np.memmap(p, dtype=np.float32, mode="w+", shape=(N, N))
        for r0 in range(0, N, 2048):
            mm[r0:r0 + 2048] = rng.standard_normal(
                (2048, N), dtype=np.float32)
        # cumulative sum down the rows = terrain-like drift
        acc = np.zeros(N, dtype=np.float32)
        for r in range(0, N, 2048):
            blk = mm[r:r + 2048]
            np.cumsum(blk, axis=0, out=blk)
            blk += acc
            acc = blk[-1].copy()
            mm[r:r + 2048] = blk
        mm.flush()
    return p


def _outs(tag, mode):
    outs = []
    for p in PRODUCTS:
        f = os.path.join(SCRATCH, f"{tag}_{p}.bin")
        outs.append(np.memmap(f, dtype=_DT[p], mode=mode,
                              shape=(N, N)))
    return tuple(outs)


def child(tag, quantized):
    sys.path.insert(0, REPO)
    from neilpy_tpu.pipelines.mosaic import mosaic_terrain_products
    Z = np.memmap(ensure_input(), dtype=np.float32, mode="r",
                  shape=(N, N))
    out = _outs(tag, "r+" if os.path.exists(
        os.path.join(SCRATCH, f"{tag}_{PRODUCTS[0]}.bin")) else "w+")
    ckpt = os.path.join(SCRATCH, f"{tag}.ckpt")
    t0 = time.time()
    mosaic_terrain_products(
        Z, out=out, checkpoint=ckpt,
        upload_dtype="uint16" if quantized else None, **KW)
    for o in out:
        o.flush()
    print(f"CHILD_DONE {tag} {time.time() - t0:.1f}", flush=True)


def run_child(tag, quantized, kill_at_tiles=None):
    cmd = [sys.executable, os.path.abspath(__file__), "--child", tag,
           "1" if quantized else "0"]
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    if kill_at_tiles is not None:
        # poll the tile checkpoint and SIGKILL MID-STREAM — a timed
        # kill can land after the last tile on a fast run (first cert
        # attempt did exactly that, tiles_done_at_kill == total)
        while proc.poll() is None:
            done = ckpt_tiles(tag)
            if done >= kill_at_tiles:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                print(f"[{tag}] SIGKILLed at t+{time.time() - t0:.0f}s "
                      f"with {done} tiles checkpointed")
                return None
            time.sleep(0.3)
        print(f"[{tag}] finished before reaching {kill_at_tiles} tiles")
        return None
    out, _ = proc.communicate()
    wall = None
    for ln in out.splitlines():
        print(f"[{tag}] {ln}")
        if ln.startswith("CHILD_DONE"):
            wall = float(ln.split()[2])
    if proc.returncode != 0:
        raise RuntimeError(f"child {tag} rc={proc.returncode}:\n"
                           + out[-2000:])
    print(f"[{tag}] wall {time.time() - t0:.1f}s (mosaic {wall}s)")
    return wall


def ckpt_tiles(tag):
    """Completed-tile count from the TileCheckpoint JSON sidecar."""
    p = os.path.join(SCRATCH, f"{tag}.ckpt")
    if not os.path.exists(p):
        return 0
    return len(json.load(open(p)))


def main():
    ensure_input()
    # fresh certification: stale outputs/checkpoints would let a run
    # "resume" to instant completion and certify nothing
    for f in os.listdir(SCRATCH):
        if f != os.path.basename(_input_path()):
            os.remove(os.path.join(SCRATCH, f))
    rec = {"date": time.strftime("%Y-%m-%d"), "side": N, **{
        k: (list(v) if isinstance(v, np.ndarray) else v)
        for k, v in KW.items()}}

    wall_plain = run_child("plain", quantized=False)
    wall_q = run_child("qA", quantized=True)
    rec["wall_plain_s"] = wall_plain
    rec["wall_quant_s"] = wall_q

    # SIGKILL mid-stream (checkpoint-triggered), resume in a fresh
    # process
    tiles_total = (N // KW["tile_size"]) ** 2
    run_child("qB", quantized=True, kill_at_tiles=tiles_total // 3)
    done_at_kill = ckpt_tiles("qB")
    rec["tiles_done_at_kill"] = done_at_kill
    rec["tiles_total"] = tiles_total
    wall_resume = run_child("qB", quantized=True)
    rec["wall_resume_s"] = wall_resume
    rec["killed_mid_stream"] = bool(
        0 < done_at_kill < tiles_total)

    # jax-free comparisons
    sys.path.insert(0, REPO)
    from tools.quplink_audit import audit_flips
    A = _outs("qA", "r")
    B = _outs("qB", "r")
    same = all(np.array_equal(np.asarray(a), np.asarray(b),
                              equal_nan=np.issubdtype(
                                  np.asarray(a).dtype, np.floating))
               for a, b in zip(A, B))
    rec["resume_bit_identical"] = bool(same)

    P = _outs("plain", "r")
    Z = np.memmap(_input_path(), dtype=np.float32, mode="r",
                  shape=(N, N))
    # global range exactly as the mosaic's moments pass computes it
    qlo, qhi = np.inf, -np.inf
    for r0 in range(0, N, 4096):
        blk = np.asarray(Z[r0:r0 + 4096])
        qlo = min(qlo, float(blk.min()))
        qhi = max(qhi, float(blk.max()))
    audit = audit_flips(Z, P[0], A[0], qlo=qlo, qhi=qhi,
                        cellsize=KW["cellsize"],
                        lookup_pixels=KW["lookup_pixels"],
                        threshold_angle=1)
    rec["flip_audit"] = audit
    rec["objects_agreement"] = float(np.mean(
        np.asarray(P[1]) == np.asarray(B[1])))
    rec["pass"] = bool(same and audit["all_flips_within_bound"]
                       and rec["killed_mid_stream"])
    out_path = os.path.join(REPO, "QUPLINK_CERT.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, out_path)       # never leave a truncated artifact
    print(json.dumps(rec, indent=1))
    print("certification", "PASS" if rec["pass"] else "FAIL",
          "->", out_path)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3] == "1")
    else:
        main()
