"""Linear 512→16 feature codec (reference C7).

The reference trains an encoder/decoder parameter pair on CLIP text
embeddings of the ADE20K-150 vocabulary with a reconstruction MSE plus a
latent cosine-preservation loss, 100k Adam steps
(``/root/reference/train_compression_encoder_decoder.py:51-96``). Same
math here in optax, jitted: the entire training step is two small
matmuls — thousands of steps per second on one TPU core.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_pytree_dataclass
class LinearCodec:
    encoder: jax.Array  # (D_in, D_lat)
    decoder: jax.Array  # (D_lat, D_in)

    @staticmethod
    def init(d_in: int = 512, d_lat: int = 16, seed: int = 0) -> "LinearCodec":
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return LinearCodec(
            encoder=jax.random.normal(k1, (d_in, d_lat), jnp.float32),
            decoder=jax.random.normal(k2, (d_lat, d_in), jnp.float32),
        )

    def compress(self, x: jax.Array) -> jax.Array:
        return x @ self.encoder

    def decompress(self, z: jax.Array) -> jax.Array:
        return z @ self.decoder


def _l2norm(x, axis=-1):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-12)


def codec_loss(codec: LinearCodec, x_norm: jax.Array) -> jax.Array:
    """MSE(x, normalize(dec(enc(x)))) + MSE of latent vs input cosine
    Gram matrices (reference losses at lines 75-91)."""
    z = codec.compress(x_norm)
    y = _l2norm(codec.decompress(z))
    loss1 = jnp.mean((x_norm - y) ** 2)
    zn = _l2norm(z)
    cos_z = zn @ zn.T
    cos_x = x_norm @ x_norm.T
    loss2 = jnp.mean((cos_z - cos_x) ** 2)
    return loss1 + loss2


def train_codec(
    embeddings: jax.Array,  # (M, D_in) e.g. CLIP text features
    d_lat: int = 16,
    steps: int = 100_000,
    lr: float = 1e-4,
    seed: int = 0,
    log_every: int = 0,
) -> Tuple[LinearCodec, float]:
    """Train the codec; returns (codec, final_loss)."""
    x = _l2norm(jnp.asarray(embeddings, jnp.float32))
    codec = LinearCodec.init(x.shape[-1], d_lat, seed)
    opt = optax.adam(lr)
    opt_state = opt.init(codec)

    @jax.jit
    def step(codec, opt_state):
        loss, grads = jax.value_and_grad(codec_loss)(codec, x)
        updates, opt_state = opt.update(grads, opt_state)
        codec = optax.apply_updates(codec, updates)
        return codec, opt_state, loss

    t1 = time.time()
    loss = jnp.inf
    # Chunked scan keeps dispatch overhead off the hot path.
    chunk = 1000 if log_every == 0 else log_every

    @jax.jit
    def run_chunk(codec, opt_state):
        def body(carry, _):
            codec, opt_state = carry
            codec, opt_state, loss = step(codec, opt_state)
            return (codec, opt_state), loss

        (codec, opt_state), losses = jax.lax.scan(
            body, (codec, opt_state), None, length=chunk
        )
        return codec, opt_state, losses[-1]

    done = 0
    while done < steps:
        codec, opt_state, loss = run_chunk(codec, opt_state)
        done += chunk
        if log_every and done % log_every == 0:
            print(done, float(loss))
    if log_every:
        print(
            "Time taken for training encoder decoder model: ",
            time.time() - t1,
        )
    return codec, float(loss)


def save_codec(codec: LinearCodec, path: str) -> None:
    np.savez(
        path,
        encoder=np.asarray(codec.encoder),
        decoder=np.asarray(codec.decoder),
    )


def load_codec(path: str) -> LinearCodec:
    data = np.load(path)
    return LinearCodec(
        encoder=jnp.asarray(data["encoder"]),
        decoder=jnp.asarray(data["decoder"]),
    )
