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

proc_id = int(sys.argv[1])
port = int(sys.argv[2])

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qtpu.ldpc.codes import make_regular_code
from qtpu.ldpc.decode import channel_llr
from qtpu.ldpc.encode import make_batch_encoder
from qtpu.parallel import make_mesh, make_sharded_reconcile_step

assert len(jax.devices()) == 8, f"global devices: {jax.devices()}"
assert len(jax.local_devices()) == 4

mesh = make_mesh("blocks")
code = make_regular_code(1024)
step = make_sharded_reconcile_step(code, mesh, max_iters=20)

# Identical global data on both processes (same seed); device_put shards it.
rng = np.random.default_rng(0)
B = 16
keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
bob = keys ^ (rng.random((B, code.n)) < 0.02).astype(np.uint8)
syn_host = np.asarray(make_batch_encoder(code)(jnp.asarray(keys)))
llr_host = np.asarray(channel_llr(jnp.asarray(bob), 0.02))

sh = NamedSharding(mesh, P("blocks", None))
llr = jax.make_array_from_callback(llr_host.shape, sh, lambda idx: llr_host[idx])
syn = jax.make_array_from_callback(syn_host.shape, sh, lambda idx: syn_host[idx])

bits, conv, iters, ledger = step(llr, syn)
gl = np.asarray(ledger)
expected_sifted = B * code.n
assert gl[0] == expected_sifted, f"sifted {gl[0]} != {expected_sifted}"
assert gl[-2] + gl[-1] == B
print(f"MULTIHOST_OK proc={proc_id} ledger={gl.tolist()}", flush=True)
