"""Parameter initializers reproducing PyTorch layer defaults.

PyTorch's Conv2d/ConvTranspose2d/Linear default to
``kaiming_uniform_(a=sqrt(5))`` which reduces to U(-1/sqrt(fan_in),
1/sqrt(fan_in)); biases use the same bound. BatchNorm starts at
gamma=1, beta=0, running_mean=0, running_var=1.

fan_in:
- conv (kh,kw,in,out):  in * kh * kw
- tconv (kh,kw,in,out): out * kh * kw   (torch computes fan_in on its
  (in,out,kh,kw) layout where dim-1 is out)
- linear (in,out):      in
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _uniform(key: jax.Array, shape: Tuple[int, ...], bound: float) -> jax.Array:
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def conv_weight(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> jax.Array:
    bound = 1.0 / math.sqrt(cin * kh * kw)
    return _uniform(key, (kh, kw, cin, cout), bound)


def conv_bias(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> jax.Array:
    bound = 1.0 / math.sqrt(cin * kh * kw)
    return _uniform(key, (cout,), bound)


def tconv_weight(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> jax.Array:
    bound = 1.0 / math.sqrt(cout * kh * kw)
    return _uniform(key, (kh, kw, cin, cout), bound)


def tconv_bias(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> jax.Array:
    bound = 1.0 / math.sqrt(cout * kh * kw)
    return _uniform(key, (cout,), bound)


def linear_weight(key: jax.Array, cin: int, cout: int) -> jax.Array:
    bound = 1.0 / math.sqrt(cin)
    return _uniform(key, (cin, cout), bound)


def linear_bias(key: jax.Array, cin: int, cout: int) -> jax.Array:
    bound = 1.0 / math.sqrt(cin)
    return _uniform(key, (cout,), bound)


def bn_weight(key: jax.Array, c: int) -> jax.Array:
    del key
    return jnp.ones((c,), jnp.float32)


def bn_bias(key: jax.Array, c: int) -> jax.Array:
    del key
    return jnp.zeros((c,), jnp.float32)
