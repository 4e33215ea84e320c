"""Primitive parameterised layers (flax.linen) with torch-mappable params.

Param naming convention: every conv/linear stores `weight` and optionally
`bias`, in channels-last layouts:
  Conv2d.weight   : (kh, kw, cin/groups, cout)   [torch: (cout, cin/g, kh, kw)]
  Conv3d.weight   : (kd, kh, kw, cin/groups, cout)
  ConvTranspose*  : (k..., cin, cout)            [torch: (cin, cout, k...)]
  Linear.weight   : (cin, cout)                  [torch: (cout, cin)]
The converter in deformablelka_tpu/convert handles the permutations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from deformablelka_tpu.ops import convs as C


def _kaiming_conv(key, shape, dtype=jnp.float32):
    """torch Conv default init: kaiming_uniform(a=sqrt(5)) ≙ U(±1/sqrt(fan_in))
    times sqrt(3)·gain… — we use the torch-equivalent bound directly."""
    # fan_in = cin/groups * prod(kernel)
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = (6.0 / ((1 + 5.0) * fan_in)) ** 0.5  # gain^2=2/(1+a^2)=1/3
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _conv_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv2d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Any = "same"
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    as_params: bool = False  # return (w, b) instead of applying (lets a
    # caller feed several convs' weights to one fused kernel while the
    # param tree stays identical to the unfused module)

    @nn.compact
    def __call__(self, x):
        kh, kw = C._tuple(self.kernel_size, 2)
        cin = x.shape[-1]
        shape = (kh, kw, cin // self.groups, self.features)
        init = self.kernel_init or _kaiming_conv
        w = self.param("weight", init, shape)
        b = None
        if self.use_bias:
            fan_in = kh * kw * (cin // self.groups)
            b = self.param("bias", _conv_bias_init(fan_in), (self.features,))
        if self.as_params:
            return w, b
        return C.conv2d(x, w, stride=self.stride, padding=self.padding,
                        dilation=self.dilation, groups=self.groups, bias=b)


class Conv3d(nn.Module):
    features: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Any = "same"
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    as_params: bool = False  # see Conv2d.as_params

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = C._tuple(self.kernel_size, 3)
        cin = x.shape[-1]
        shape = (kd, kh, kw, cin // self.groups, self.features)
        init = self.kernel_init or _kaiming_conv
        w = self.param("weight", init, shape)
        b = None
        if self.use_bias:
            fan_in = kd * kh * kw * (cin // self.groups)
            b = self.param("bias", _conv_bias_init(fan_in), (self.features,))
        if self.as_params:
            return w, b
        return C.conv3d(x, w, stride=self.stride, padding=self.padding,
                        dilation=self.dilation, groups=self.groups, bias=b)


class ConvTranspose(nn.Module):
    """Transposed conv with MONAI get_conv_layer padding rules
    (dynunet_block.py:217-277); works for 2D and 3D by input rank."""
    features: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        ks = C._tuple(self.kernel_size, ndim)
        cin = x.shape[-1]
        shape = (*ks, cin, self.features)
        w = self.param("weight", _kaiming_conv, shape)
        b = None
        if self.use_bias:
            fan_in = cin * int(np.prod(ks))
            b = self.param("bias", _conv_bias_init(fan_in), (self.features,))
        return C.conv_transpose(x, w, stride=self.stride, bias=b)


class Linear(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init = self.kernel_init or _kaiming_conv
        w = self.param("weight", init, (cin, self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", _conv_bias_init(cin), (self.features,))
            y = y + b.astype(y.dtype)
        return y


class DropPath(nn.Module):
    """Stochastic depth (per-sample). Identity in eval."""
    rate: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        det = self.deterministic if deterministic is None else deterministic
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def gelu(x):
    """torch default GELU (exact erf), matching nn.GELU()."""
    return jax.nn.gelu(x, approximate=False)
