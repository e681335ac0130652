import json, sys, time
import numpy as np, jax, jax.numpy as jnp
ndev = int(sys.argv[1])
sys.path.insert(0, '/root/repo')
from jax.sharding import PartitionSpec as Psp
import functools
from qtpu.parallel import make_mesh
mesh = make_mesh("blocks", num=ndev)
axis = "blocks"
# (a) pure psum of a ledger-sized vector at this mesh size
@jax.jit
@functools.partial(jax.shard_map, mesh=mesh, in_specs=(Psp(axis, None),),
                   out_specs=Psp())
def do_psum(x):
    return jax.lax.psum(jnp.sum(x, axis=0), axis)
x = jnp.ones((ndev * 8, 16), jnp.int32)
r = do_psum(x); r.block_until_ready()
t0 = time.perf_counter()
for _ in range(50): r = do_psum(x)
r.block_until_ready()
psum_ms = (time.perf_counter() - t0) / 50 * 1e3
# (b) sharded decode alone (B=64 over mesh) vs unsharded
from qtpu.ldpc.codes import make_regular_code
from qtpu.ldpc.decode import make_batch_decoder, channel_llr
from qtpu.ldpc.encode import make_batch_encoder
code = make_regular_code(4096)
B = 64
rng = np.random.default_rng(0)
keys = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
bob = keys ^ (rng.random((B, code.n)) < 0.02).astype(np.uint8)
syn = make_batch_encoder(code)(jnp.asarray(keys)); syn.block_until_ready()
llr = channel_llr(jnp.asarray(bob), 0.02)
bl = B // ndev
dec_sh = make_batch_decoder(code, max_iters=30, alg="layered")
@jax.jit
@functools.partial(jax.shard_map, mesh=mesh,
                   in_specs=(Psp(axis, None), Psp(axis, None)),
                   out_specs=Psp(axis, None))
def dec_mesh(l, s):
    return dec_sh(l, s).bits
r = dec_mesh(llr, syn); r.block_until_ready()
t0 = time.perf_counter()
for _ in range(5): r = dec_mesh(llr, syn)
r.block_until_ready()
dec_ms = (time.perf_counter() - t0) / 5 * 1e3
print(json.dumps({"ndev": ndev, "psum_ms": round(psum_ms, 3),
                  "sharded_decode_ms": round(dec_ms, 1)}))
