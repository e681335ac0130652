"""Worker for the two-process jax.distributed test (BASELINE config 5).

Each process contributes 4 forced CPU devices; the global mesh has 8. The
sharded reconcile step (DP decode + global psum ledger) must produce the
same global ledger on both processes — the multi-host mechanism of SURVEY.md
§6.8 exercised for real, not just on a forced single-process mesh.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# Persistent compile cache: the first collective's Gloo context init times
# out (30 s) if the two processes' compile times diverge under host load;
# cached compiles keep the rendezvous gap near zero.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

proc_id = int(sys.argv[1])
port = int(sys.argv[2])

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qtpu import prng
from qtpu.accounting import LEDGER_FIELDS
from qtpu.ldpc.codes import make_regular_code
from qtpu.ldpc.encode import make_batch_encoder
from qtpu.parallel import make_mesh
from qtpu.window_programs import make_window_programs

assert len(jax.devices()) == 8, f"global devices: {jax.devices()}"
assert len(jax.local_devices()) == 4

mesh = make_mesh("blocks")
code = make_regular_code(1024)
pay = np.arange(code.n, dtype=np.int64)
empty = np.zeros(0, np.int64)
progs = make_window_programs(code, pay, empty, empty, max_iters=20,
                             alg="minsum", verify_hash_bits=64, l_max=128,
                             batch=16, mesh=mesh)

# Identical global data on both processes (same seed); sharding splits it.
rng = np.random.default_rng(0)
B = 16
keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
bob = keys ^ (rng.random((B, code.n)) < 0.02).astype(np.uint8)
syn_host = np.asarray(make_batch_encoder(code)(jnp.asarray(keys)))
vkey = prng.key_data(prng.derive(prng.root_key(3), "verify", 0))
# Alice's reference hashes, mirrored HOST-SIDE (per-block fold_in seeds +
# golden Toeplitz) — no cross-process collectives outside the shard_map.
from qtpu.pa import toeplitz_hash_golden
key = jax.random.wrap_key_data(vkey)
rows = []
for i in range(B):
    with jax.default_device(jax.local_devices()[0]):
        k = jax.random.fold_in(key, np.uint32(i))
        rows.append(np.asarray(jax.random.bernoulli(k, 0.5, (code.n + 63,))))
t = np.stack(rows).astype(np.uint8)
exp_hash_host = np.stack([toeplitz_hash_golden(t[i], keys[i], 64)
                          for i in range(B)])

sh = NamedSharding(mesh, P("blocks", None))
rep = NamedSharding(mesh, P())
def mk(h, sharding):
    return jax.make_array_from_callback(np.asarray(h).shape, sharding,
                                        lambda idx: np.asarray(h)[idx])
xmask = np.zeros(code.n, np.uint8)
shortfill = np.zeros((B, 0), np.uint8)
mag = np.float32(np.log(0.98 / 0.02))

hat, stats, ledger = progs.bob(
    mk(bob, sh), mk(xmask, rep), mk(shortfill, rep),
    mk(syn_host, sh), mk(exp_hash_host, sh), mk(mag, rep), mk(vkey, rep))
# The ledger is replicated over the GLOBAL mesh; a cross-process fetch is
# not allowed — any local shard holds the full (psum'd) value.
gl = np.asarray(ledger.addressable_shards[0].data)
idx = {f: i for i, f in enumerate(LEDGER_FIELDS)}
assert gl[idx["syndrome_bits"]] == B * code.m
assert gl[idx["blocks_ok"]] + gl[idx["blocks_failed"]] == B
assert gl[idx["blocks_ok"]] == B, "all blocks should verify at 2%"
print(f"MULTIHOST_OK proc={proc_id} ledger={gl.tolist()}", flush=True)
