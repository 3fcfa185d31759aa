"""Batch-of-trains operations: the packed kernels are vmappable, giving
batched inner products / rounding over stacked TTs (used for scoring many
candidates at once)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.ops import packed as pk

np.random.seed(31)


def _stacked_tts(count, d, n, r):
    nets = []
    packs = []
    for i in range(count):
        np.random.seed(100 + i)
        indices = [Index(f"x{k}", n) for k in range(d)]
        tn = TensorNetwork.rand_tt(indices, [r] * (d - 1))
        nets.append(tn)
        packs.append(pk.pack(tn))
    stacked = pk.PackedTT(
        jnp.stack([p.first for p in packs]),
        jnp.stack([p.mids for p in packs]),
        jnp.stack([p.last for p in packs]),
    )
    return nets, packs, stacked


def test_vmapped_inner_products():
    nets, packs, stacked = _stacked_tts(4, 5, 4, 3)
    probe = packs[0]

    batched = jax.vmap(lambda f, m, l: pk.inner(
        pk.PackedTT(f, m, l), probe
    ))(stacked.first, stacked.mids, stacked.last)

    expected = [float(nets[i].inner(nets[0])) for i in range(4)]
    assert np.allclose(np.asarray(batched), expected, rtol=1e-10)


def test_vmapped_rand_round():
    nets, packs, _ = _stacked_tts(3, 6, 4, 2)
    doubled = [pk.add(p, p) for p in packs]  # rank 4, true rank 2
    stacked = pk.PackedTT(
        jnp.stack([p.first for p in doubled]),
        jnp.stack([p.mids for p in doubled]),
        jnp.stack([p.last for p in doubled]),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 3)

    rounded = jax.vmap(
        lambda f, m, l, k: pk.rand_round(pk.PackedTT(f, m, l), 2, k)
    )(stacked.first, stacked.mids, stacked.last, keys)

    for i in range(3):
        one = pk.PackedTT(
            rounded.first[i], rounded.mids[i], rounded.last[i]
        )
        dense = 2 * np.asarray(nets[i].contract().value)
        got = np.asarray(pk.unpack(one).contract().value)
        assert np.allclose(got, dense, atol=1e-9)
