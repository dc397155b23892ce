"""CycleGAN networks — the "Image Content-Extractor" style-transfer nets.

Behavioral contract (reference mmseg/models/cyclegan/cyclegan_model.py):
  * ResnetGenerator (:316-375): reflect-pad 7x7 conv -> 2 stride-2 downs ->
    n residual blocks (reflect-pad 3x3 convs, instance norm, no affine) ->
    2 ConvTranspose ups (k3 s2 p1 op1) -> reflect-pad 7x7 conv -> tanh.
    The flagship checkpoint ``cityscapes_ICD_to_dsec_EN.pth`` is the 1ch->1ch
    9-block instance-norm variant used frozen at train time to convert the
    source temporal-difference frame into night-event style
    (reference mmseg/models/uda/dacs.py:96-103, 400-404).
  * NLayerDiscriminator (:539-585): 4x4 stride-2 PatchGAN.
  * PixelDiscriminator (:587-616): 1x1 PatchGAN.
  * LightNet (:619-621): 3-block batch-norm ResnetGenerator (3ch).
  * gan_loss: lsgan (MSE) / vanilla (BCE-with-logits) / wgangp objectives.

All NHWC. Instance norm = per-sample/channel spatial standardization
(affine=False, no running stats) — matching torch defaults exactly.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn


def instance_norm(x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class TorchConvTranspose(nn.Module):
    """ConvTranspose matching torch semantics (k, s, p, output_padding)."""
    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p, op = (self.kernel_size, self.stride, self.padding,
                       self.output_padding)
        # layout (k, k, out, in) + transpose_kernel=True == torch ConvTranspose2d
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02),
            (k, k, self.features, x.shape[-1]))
        lo = k - 1 - p
        hi = k - 1 - p + op
        y = jax.lax.conv_transpose(
            x, kernel,
            strides=(s, s), padding=((lo, hi), (lo, hi)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class PaddedOutConv(nn.Module):
    """7x7 VALID conv whose kernel is zero-padded to >=8 output channels at
    apply time, then sliced back.

    Same params and math as ``nn.Conv(output_nc, (7,7))`` (channel 0 of a
    wider conv is bit-identical; the torch importer's conv_out.kernel/bias
    mapping is unchanged) — but a 1-channel f32 [B,512,512,1] conv output
    tiles pathologically on TPU (T(8,128) with 127/128 lanes dead: ~19 ms
    vs ~3 ms, r3 trace, docs/PERF.md)."""
    out_nc: int

    @nn.compact
    def __call__(self, y):
        cin = y.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.out_nc))
        bias = self.param("bias", nn.initializers.zeros, (self.out_nc,))
        pad_to = max(8, self.out_nc)
        kern = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0),
                                (0, pad_to - self.out_nc)))
        out = jax.lax.conv_general_dilated(
            y, kern.astype(y.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[..., :self.out_nc] + bias


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "instance"
    use_bias: bool = True

    def _norm(self, x, name):
        if self.norm == "instance":
            return instance_norm(x)
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name=name)(x)

    @nn.compact
    def __call__(self, x):
        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=self.use_bias,
                    name="conv1")(y)
        y = nn.relu(self._norm(y, "bn1"))
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=self.use_bias,
                    name="conv2")(y)
        y = self._norm(y, "bn2")
        return x + y


class ResnetGenerator(nn.Module):
    """reflect7x7 -> 2 downs -> n_blocks res -> 2 ups -> reflect7x7 -> tanh."""
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"

    def _norm(self, x, name):
        if self.norm == "instance":
            return instance_norm(x)
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name=name)(x)

    @nn.compact
    def __call__(self, x):
        use_bias = self.norm == "instance"
        ngf = self.ngf
        y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = nn.Conv(ngf, (7, 7), padding="VALID", use_bias=use_bias,
                    name="conv_in")(y)
        y = nn.relu(self._norm(y, "bn_in"))
        for i in range(2):
            mult = 2 ** i
            y = nn.Conv(ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=use_bias,
                        name=f"down{i}")(y)
            y = nn.relu(self._norm(y, f"bn_down{i}"))
        for i in range(self.n_blocks):
            y = ResnetBlock(ngf * 4, norm=self.norm, use_bias=use_bias,
                            name=f"resblock{i}")(y)
        for i in range(2):
            mult = 2 ** (2 - i)
            y = TorchConvTranspose(ngf * mult // 2, 3, 2, 1, 1,
                                   use_bias=use_bias, name=f"up{i}")(y)
            y = nn.relu(self._norm(y, f"bn_up{i}"))
        y = jnp.pad(y, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = PaddedOutConv(self.output_nc, name="conv_out")(y)
        return jnp.tanh(y)


def generator_from_params(params, norm: str = "instance") -> ResnetGenerator:
    """Rebuild a ResnetGenerator matching a loaded param tree: ngf from the
    conv_in kernel's output channels, n_blocks by counting ``resblock*``
    entries, output_nc from the conv_out bias. Lets checkpoints of any size
    (the reference 9-block .pth or a tools/train_cyclegan.py .npz) plug into
    the frozen-generator slots without hard-coded hyperparams."""
    ngf = int(params["conv_in"]["kernel"].shape[-1])
    n_blocks = sum(1 for k in params if str(k).startswith("resblock"))
    output_nc = int(params["conv_out"]["bias"].shape[-1])
    return ResnetGenerator(output_nc=output_nc, ngf=ngf, n_blocks=n_blocks,
                           norm=norm)


def light_net():
    """3-block batch-norm 3ch generator (reference :619-621)."""
    return ResnetGenerator(output_nc=3, ngf=64, n_blocks=3, norm="batch")


class NLayerDiscriminator(nn.Module):
    """4x4 stride-2 PatchGAN discriminator -> 1ch prediction map."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.norm == "instance"

        def norm(y, name):
            if self.norm == "instance":
                return instance_norm(y)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)(y)

        y = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="conv0")(x)
        y = nn.leaky_relu(y, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            y = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=use_bias,
                        name=f"conv{n}")(y)
            y = nn.leaky_relu(norm(y, f"bn{n}"), 0.2)
        nf = min(2 ** self.n_layers, 8)
        y = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=use_bias,
                    name=f"conv{self.n_layers}")(y)
        y = nn.leaky_relu(norm(y, f"bn{self.n_layers}"), 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                       name="conv_out")(y)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (pixel) discriminator."""
    ndf: int = 64
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        use_bias = self.norm == "instance"
        y = nn.Conv(self.ndf, (1, 1), name="conv0")(x)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.ndf * 2, (1, 1), use_bias=use_bias, name="conv1")(y)
        y = nn.leaky_relu(instance_norm(y) if self.norm == "instance" else y, 0.2)
        return nn.Conv(1, (1, 1), use_bias=use_bias, name="conv_out")(y)


def gan_loss(prediction, target_is_real: bool, mode: str = "lsgan"):
    """lsgan: MSE to the 0/1 target; vanilla: BCE-with-logits; wgangp: mean."""
    if mode == "lsgan":
        target = jnp.full_like(prediction, 1.0 if target_is_real else 0.0)
        return jnp.mean((prediction - target) ** 2)
    if mode == "vanilla":
        target = jnp.full_like(prediction, 1.0 if target_is_real else 0.0)
        logp = jax.nn.log_sigmoid(prediction)
        log1mp = jax.nn.log_sigmoid(-prediction)
        return -jnp.mean(target * logp + (1 - target) * log1mp)
    if mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
    raise NotImplementedError(mode)


def gradient_penalty(critic_fn, rng, real, fake, *, kind: str = "mixed",
                     constant: float = 1.0, lambda_gp: float = 10.0):
    """WGAN-GP penalty (reference cyclegan_model.py:279-313
    cal_gradient_penalty): lambda * mean((||d critic/d x||_2 - c)^2) at
    real / fake / per-sample-alpha-mixed inputs. ``critic_fn(x) -> scores``
    must already close over the discriminator params."""
    if lambda_gp <= 0.0:
        return jnp.asarray(0.0)
    if kind == "real":
        x = real
    elif kind == "fake":
        x = fake
    elif kind == "mixed":
        alpha = jax.random.uniform(
            rng, (real.shape[0],) + (1,) * (real.ndim - 1))
        x = alpha * real + (1.0 - alpha) * fake
    else:
        raise NotImplementedError(kind)

    def scalar_critic(xi):
        # sum over outputs == grad_outputs=ones in the torch call
        return jnp.sum(critic_fn(xi[None]))

    grads = jax.vmap(jax.grad(scalar_critic))(x)
    flat = grads.reshape(real.shape[0], -1)
    norms = jnp.linalg.norm(flat + 1e-16, axis=1)
    return lambda_gp * jnp.mean((norms - constant) ** 2)
