"""Typed configuration tree + named presets + CLI overrides.

Replaces the reference's per-script flag soup (C16 in SURVEY.md section 2:
``argparse`` in ``synthetic/main_synthetic.py`` and carpedm20-style
``tf.app.flags`` in ``celebA/main.py``) with one frozen-dataclass config tree.
All reference hyperparameters are represented: refinement depth K ("rollout
steps"), refinement step size lambda ("rollout rate"), DRS rejection gamma,
shaping interval, mode/method selectors, Adam (lr, beta1), batch/z sizes,
dataset/crop options, and checkpoint dirs.

The five BASELINE.json configs ship as named presets:
``toy2d``, ``mnist``, ``fmnist``, ``cifar10``, ``celeba``, ``imagenet64``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

# ---------------------------------------------------------------------------
# Leaf configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the (G, D) pair.

    ``kind='mlp'`` covers the reference's synthetic models (C2): MLP generator
    z in R^{z_dim} -> R^{data_dim} and MLP discriminator R^{data_dim} -> logit.
    ``kind='dcgan'`` covers C7/C8: transposed-conv generator and conv
    discriminator for 28x28x1 .. 64x64x3 images, optionally class-conditional
    (``num_classes > 0``, the ImageNet-64 extension required by BASELINE.json).
    """

    kind: str = "mlp"  # 'mlp' | 'dcgan'
    z_dim: int = 4
    data_dim: int = 2  # MLP data dimensionality (2 for the toy problems)
    g_hidden: int = 128
    d_hidden: int = 128
    g_layers: int = 3
    d_layers: int = 3
    # DCGAN:
    image_size: int = 32
    channels: int = 3
    g_base_filters: int = 64  # filters in the last deconv stage (gf_dim)
    d_base_filters: int = 64  # filters in the first conv stage (df_dim)
    num_classes: int = 0  # 0 = unconditional
    # Compute dtype for the forward/backward pass. Params stay float32.
    # bfloat16 keeps the MXU fed at full rate on TPU.
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection (C1 + C9).

    2D mixtures are procedural (no files). Image datasets load from
    ``path`` when present; when absent (offline environments) the loaders
    fall back to a deterministic procedural image distribution so every code
    path stays runnable — see data/images.py.
    """

    dataset: str = "ring8"  # ring8|ring8_imbalanced|grid25|mnist|fmnist|cifar10|celeba|imagenet64
    path: str = ""  # local dataset root ('' = procedural fallback)
    # CelebA-style preprocessing (C9): center-crop then resize.
    crop_size: int = 108
    # 2D mixture geometry:
    ring_radius: float = 2.0
    mixture_std: float = 0.02


@dataclass(frozen=True)
class TrainConfig:
    """GAN training loop hyperparameters (C3/C10)."""

    batch_size: int = 256
    niters: int = 4000  # total D-step iterations
    d_lr: float = 2e-4
    g_lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    d_steps: int = 1  # D updates per iteration
    g_steps: int = 1  # G updates per iteration (carpedm20 image trainers use 2)
    # FusedProp (arXiv:2004.03335): compute D and G gradients from ONE
    # G-forward + D-forward on the fake batch by reusing the VJP pullbacks
    # with the two losses' cotangents. Simultaneous-update semantics
    # (ignores d_steps/g_steps); ~1 G-fwd + 1 D-fwd cheaper per iteration.
    fused_prop: bool = False
    # R1 gradient penalty (Mescheder et al., arXiv:1801.04406):
    # 0.5 * gamma * E[||grad_x D(x_real)||^2] added to the D loss. Smooths
    # D's data-space gradient field — the exact object refinement follows
    # (SURVEY.md C4) — so it is a natural training-time companion to
    # shaping; 0 = off (the reference trains unregularized). Reported as
    # the 'r1' train metric (the raw E||grad||^2, before gamma/2).
    r1_gamma: float = 0.0
    g_ema_decay: float = 0.0  # exponential moving average of G params
    # (ema = d_t*ema + (1-d_t)*params per iteration, with the TF1
    # num_updates decay warmup d_t = min(d, (1+t)/(10+t)) so short runs
    # shed the random init); 0 = off. When tracked, sampling/eval/serving
    # use the EMA generator (standard production-GAN practice; beyond the
    # reference). 0.999 is a good default at image scale
    steps_per_call: int = 50  # lax.scan'd train steps per host dispatch
    log_every: int = 200
    ckpt_every: int = 1000
    viz_every: int = 0  # 0 = off
    # Mirror train metrics as TensorBoard scalars to <workdir>/tb (the
    # reference image trainer's convention, C10) alongside the JSONL.
    tensorboard: bool = False


@dataclass(frozen=True)
class RefineConfig:
    """Sampling-strategy hyperparameters (C4/C5/C6/C11/C12).

    ``method`` selects the reference's benchmark matrix entries:
    ``standard`` (raw G samples), ``reject`` (DRS), ``mhgan``,
    ``refinement`` (gradient refinement only), ``collab``
    (refine + reject + periodic D shaping).
    """

    method: str = "collab"
    steps: int = 10  # K, the reference's "rollout steps"
    rate: float = 0.1  # lambda, the reference's "rollout rate"
    clip_norm: float = 0.0  # 0 = no per-sample gradient clipping
    noise: float = 0.0  # Langevin noise scale: x += sqrt(2*rate*noise)*N(0,I)
    # per step (DGflow-style stochastic refinement, arXiv:2012.00780); 0 =
    # deterministic gradient refinement (the reference's scheme)
    objective: str = "ns"  # refinement flow objective (f-divergence drift,
    # DGflow arXiv:2012.00780): 'ns' = softplus(-D), the reference's
    # non-saturating loss (= JS-flow drift); 'kl' = -D, pure logit ascent
    # (with noise>0 this is the KL Langevin flow); 'saturating' =
    # -softplus(D), descent on log(1-D) (weights confident samples most)
    space: str = "x"  # refinement space: 'x' = data space (the
    # reference's scheme, x_{k+1} = x_k - rate*grad_x l(D(x))); 'z' =
    # latent space (DGflow arXiv:2012.00780 section 4.1 for image models:
    # drift z along -grad_z l(D(G(z))) so every iterate stays ON G's
    # output manifold, then emit x = G(z_K)). 'z' applies to the
    # draw-and-refine samplers (refinement/collab/serving); trajectory
    # viz and refining externally provided x0 are x-space by nature.
    stop_score: float = 0.0  # per-sample early stop: freeze a sample once
    # sigmoid(D(x)) >= stop_score, i.e. once D already believes it is real.
    # Refinement ascends D's score, so with a hot (K, rate) samples keep
    # climbing into D's adversarial/off-manifold region past plausibility —
    # the overshoot failure mode the quality campaigns hit at well-trained
    # checkpoints (BASELINE.md). A threshold bounds the ascent per sample
    # instead of per run, making results robust to (K, rate) mis-tuning.
    # 0 = off (reference behavior); 0.5 = stop at D's decision boundary.
    proximal: float = 0.0  # DOT-style proximity cost (Tanaka, NeurIPS 2019
    # arXiv:1910.06832, "Discriminator Optimal Transport"): the drift
    # becomes grad l(D(x)) + proximal*(x - x0), i.e. descent on
    # l(D(x)) + (proximal/2)*||x - x0||^2 anchored to the INITIAL sample
    # (in z-space, anchored to z0). Where stop_score hard-freezes a sample
    # once D likes it, the proximal term bounds how FAR refinement can
    # carry every sample from G's output — a smooth overshoot guard with a
    # transport-cost interpretation. 0 = off (reference behavior).
    # Stability: the anchor term is explicit-Euler integrated, so keep
    # rate * proximal < 2 (above that the anchored coordinate oscillates
    # divergently instead of contracting).
    use_pallas: bool = True  # fused Pallas fast-path where supported
    use_s2d: bool = True  # space-to-depth conv-D refine fast path (exact
    # math in permuted coordinates; ops/refine_s2d.py)
    # DRS rejection (C5):
    gamma: float = 0.0  # static acceptance shift; <0 accepts more
    gamma_percentile: float = 80.0  # dynamic gamma: batch percentile of
    # F_hat (0 disables); samples at this percentile get p=0.5
    burn_in: int = 2048  # samples used to estimate the logit max M
    per_class_drs: bool = False  # conditional models: calibrate M per class
    # (scatter-max over burn-in) so each class's acceptance is centred on
    # its own logit scale; classes unseen in burn-in fall back to the
    # global max. Needs burn_in >> num_classes to be well estimated.
    eps_drs: float = 1e-6
    # MH-GAN (C6):
    mh_chain_len: int = 40
    # Discriminator shaping (C11):
    shape_every: int = 1  # shape D every m refined batches (0 = never)
    shaping_steps: int = 1  # D updates per shaping event (0 = none)
    shaping_lr: float = 1e-4
    shaping_decay: float = 1.0  # lr multiplier per shaping update (<1 =
    # exponential decay schedule; the paper's 'anneal shaping' variant)
    shaping_target: float = 0.0  # skip the update when D's real-vs-refined
    # logit separation is already below this ('shape until target'); 0 = off
    class_balanced_shaping: bool = True  # conditional models: draw shaping
    # real batches with the refined batch's labels (within-class signal for
    # the projection D; see BASELINE.md ImageNet-64 boundary)
    shaping_freeze_embed: bool = False  # conditional models: freeze the
    # projection-embedding rows during shaping and fine-tune only the shared
    # trunk — with many classes and small batches the per-class embedding
    # gradient is noise (~batch/num_classes samples per row) while the trunk
    # sees the full batch
    shaping_class_weight: bool = False  # conditional models: stratify the
    # shaping loss by class (inverse-frequency per-sample weights; each class
    # present in the batch contributes equally) so skewed label draws cannot
    # let frequent classes drown rare ones in the shaping gradient. Exact
    # no-op on class-balanced batches.
    shaping_anchor: float = 0.0  # L2-SP trust region: add
    # 0.5 * anchor * ||d_params - d_params_restored||^2 to the shaping loss
    # so the shaped D cannot drift far from the trained one; a principled
    # replacement for hand-shrinking shaping_lr at well-trained checkpoints
    shaping_r1_gamma: float = 0.0  # R1 penalty (arXiv:1801.04406) on the
    # real batch inside each shaping update: shaping exists to keep D's
    # data-space gradient field pointing at the manifold, and R1 penalizes
    # that field's magnitude/roughness directly — a smoothness counterpart
    # to shaping_anchor's parameter-space trust region. 0 = off.
    # Sampling volume:
    num_batches: int = 40
    batch_size: int = 256


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation settings (C13)."""

    hq_std: float = 4.0  # %HQ threshold: within hq_std * mixture_std of a mode
    fid_num_samples: int = 10000
    fid_batch_size: int = 256
    feature_net: str = "auto"  # 'auto' | 'random_conv' | path to inception params
    feature_train_steps: int = 1500  # classifier-feature training budget
    # Precomputed real-data (mu, Sigma) npz (the reference's pattern, C13):
    # loaded if the file exists (pytorch-fid/TTUR key conventions accepted),
    # computed-and-saved there otherwise. Must match feature_net — files
    # written by this framework carry the label and are checked.
    real_stats_path: str = ""
    # 0 = robust eigh cross term (default); >0 = Newton-Schulz with that
    # many iterations (all-matmul MXU path, needs well-conditioned stats).
    newton_schulz_iters: int = 0
    # Improved precision/recall (arXiv:1904.06991) sample-pool size per
    # side; 0 disables. Reported alongside FID by Experiment.evaluate.
    prd_samples: int = 0
    prd_k: int = 3  # k-NN manifold neighbourhood size
    # Kernel Inception Distance (arXiv:1801.01401): number of random
    # subsets; 0 disables. Unbiased, no Gaussian assumption — the
    # small-sample companion to FID. Reported as kid / kid_std.
    kid_subsets: int = 0
    kid_subset_size: int = 1024
    # Intra-FID (per-class FID, conditional models): evaluate the N most
    # frequent classes; 0 disables. Global FID over a mixed pool cannot see
    # per-class failures (class swaps, per-class collapse).
    intra_fid_classes: int = 0
    intra_fid_min_count: int = 32


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism settings (the C18/C19 TPU-native equivalents).

    The only model-relevant axis for <=64x64 DCGANs is the batch ('data')
    axis; TP/PP/SP/EP are deliberately out of scope (SURVEY.md section 2).
    """

    data_axis: int = -1  # number of chips on the data axis; -1 = all visible


@dataclass(frozen=True)
class Config:
    name: str = "toy2d"
    seed: int = 0
    workdir: str = "runs/toy2d"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    refine: RefineConfig = field(default_factory=RefineConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        """Inverse of to_dict — e.g. rebuild the exact experiment Config
        from a checkpoint dir's ``config.json`` sidecar (utils/checkpoint).

        Tolerant in both directions across schema evolution: leaf fields
        unknown to THIS schema are dropped (newer sidecar, older code) and
        fields absent from the dict take their defaults (older sidecar,
        newer code) — the sidecar hash check remains the strict gate.
        """
        leaves = {"model": ModelConfig, "data": DataConfig,
                  "train": TrainConfig, "refine": RefineConfig,
                  "eval": EvalConfig, "mesh": MeshConfig}
        kw: dict[str, Any] = {}
        top = {f.name for f in dataclasses.fields(cls)}
        for k, v in d.items():
            if k in leaves:
                known = {f.name for f in dataclasses.fields(leaves[k])}
                kw[k] = leaves[k](**{a: b for a, b in v.items()
                                     if a in known})
            elif k in top:
                kw[k] = v
        return cls(**kw)

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    # -- validation ---------------------------------------------------------

    def validate(self) -> "Config":
        """Raise ValueError on configurations that are known-broken before
        any device work starts — a clear message here beats a cryptic XLA
        or flax error minutes into a run. Returns self for chaining."""
        problems: list[str] = []

        def need(cond: bool, msg: str) -> None:
            if not cond:
                problems.append(msg)

        r, t, e, m = self.refine, self.train, self.eval, self.model
        need(m.z_dim > 0, f"model.z_dim must be > 0, got {m.z_dim}")
        need(m.num_classes >= 0,
             f"model.num_classes must be >= 0, got {m.num_classes}")
        need(t.batch_size > 0,
             f"train.batch_size must be > 0, got {t.batch_size}")
        need(t.niters >= 0, f"train.niters must be >= 0, got {t.niters}")
        need(t.steps_per_call > 0,
             f"train.steps_per_call must be > 0, got {t.steps_per_call}")
        need(0.0 <= t.g_ema_decay < 1.0,
             f"train.g_ema_decay must be in [0, 1), got {t.g_ema_decay}")
        need(t.r1_gamma >= 0.0,
             f"train.r1_gamma must be >= 0, got {t.r1_gamma}")
        need(r.steps >= 0, f"refine.steps must be >= 0, got {r.steps}")
        need(r.rate >= 0.0, f"refine.rate must be >= 0, got {r.rate}")
        need(r.batch_size > 0,
             f"refine.batch_size must be > 0, got {r.batch_size}")
        need(r.num_batches > 0,
             f"refine.num_batches must be > 0, got {r.num_batches}")
        need(r.burn_in > 0, f"refine.burn_in must be > 0, got {r.burn_in}")
        need(0.0 <= r.stop_score < 1.0,
             f"refine.stop_score must be in [0, 1) (a sigmoid threshold; "
             f"1.0 would never trigger), got {r.stop_score}")
        need(r.proximal >= 0.0,
             f"refine.proximal must be >= 0, got {r.proximal}")
        need(r.rate * r.proximal < 2.0,
             f"refine.rate * refine.proximal = {r.rate * r.proximal:g} "
             ">= 2: the explicit-Euler proximal anchor oscillates "
             "divergently (see RefineConfig.proximal) — lower one of them")
        need(0.0 <= r.gamma_percentile <= 100.0,
             f"refine.gamma_percentile must be in [0, 100], got "
             f"{r.gamma_percentile}")
        need(r.shape_every >= 0,
             f"refine.shape_every must be >= 0, got {r.shape_every}")
        need(r.shaping_steps >= 0,
             f"refine.shaping_steps must be >= 0, got {r.shaping_steps}")
        need(r.shaping_r1_gamma >= 0.0,
             f"refine.shaping_r1_gamma must be >= 0, got {r.shaping_r1_gamma}")
        need(e.fid_num_samples > 0 and e.fid_batch_size > 0,
             "eval.fid_num_samples and eval.fid_batch_size must be > 0, "
             f"got {e.fid_num_samples}/{e.fid_batch_size}")
        need(e.prd_k > 0, f"eval.prd_k must be > 0, got {e.prd_k}")
        if problems:
            raise ValueError("invalid config:\n  - " + "\n  - ".join(problems))
        return self


# ---------------------------------------------------------------------------
# Presets — the five BASELINE.json configs (+ fashion-mnist split out)
# ---------------------------------------------------------------------------


def _toy2d() -> Config:
    return Config(
        name="toy2d",
        workdir="runs/toy2d",
        model=ModelConfig(kind="mlp", z_dim=4, data_dim=2, g_hidden=128,
                          d_hidden=128, g_layers=3, d_layers=3,
                          compute_dtype="float32"),
        data=DataConfig(dataset="ring8_imbalanced", mixture_std=0.1,
                        ring_radius=2.0),
        train=TrainConfig(batch_size=256, niters=4000, d_lr=1e-3, g_lr=1e-3,
                          beta1=0.5),
        refine=RefineConfig(steps=10, rate=0.1, shape_every=1,
                            use_pallas=True),
    )


def _mnist() -> Config:
    return Config(
        name="mnist",
        workdir="runs/mnist",
        model=ModelConfig(kind="dcgan", z_dim=100, image_size=28, channels=1,
                          g_base_filters=64, d_base_filters=64),
        data=DataConfig(dataset="mnist"),
        train=TrainConfig(batch_size=256, niters=4000, d_lr=2e-4, g_lr=2e-4,
                          g_steps=2, steps_per_call=20),
        refine=RefineConfig(steps=10, rate=0.02, shape_every=4,
                            batch_size=256),
    )


def _fmnist() -> Config:
    c = _mnist()
    return c.replace(name="fmnist", workdir="runs/fmnist",
                     data=DataConfig(dataset="fmnist"))


def _cifar10() -> Config:
    return Config(
        name="cifar10",
        workdir="runs/cifar10",
        model=ModelConfig(kind="dcgan", z_dim=100, image_size=32, channels=3,
                          g_base_filters=64, d_base_filters=64),
        data=DataConfig(dataset="cifar10"),
        train=TrainConfig(batch_size=256, niters=20000, d_lr=2e-4, g_lr=2e-4,
                          g_steps=2, steps_per_call=20),
        refine=RefineConfig(steps=10, rate=0.02, shape_every=4,
                            batch_size=256),
    )


def _celeba() -> Config:
    return Config(
        name="celeba",
        workdir="runs/celeba",
        model=ModelConfig(kind="dcgan", z_dim=100, image_size=64, channels=3,
                          g_base_filters=64, d_base_filters=64),
        data=DataConfig(dataset="celeba", crop_size=108),
        train=TrainConfig(batch_size=128, niters=40000, d_lr=2e-4, g_lr=2e-4,
                          g_steps=2, steps_per_call=10),
        refine=RefineConfig(steps=10, rate=0.01, shape_every=4,
                            batch_size=128),
    )


def _imagenet64() -> Config:
    return Config(
        name="imagenet64",
        workdir="runs/imagenet64",
        model=ModelConfig(kind="dcgan", z_dim=128, image_size=64, channels=3,
                          g_base_filters=96, d_base_filters=96,
                          num_classes=1000),
        data=DataConfig(dataset="imagenet64"),
        train=TrainConfig(batch_size=256, niters=100000, d_lr=2e-4, g_lr=2e-4,
                          g_steps=1, steps_per_call=10),
        refine=RefineConfig(steps=10, rate=0.01, shape_every=4,
                            batch_size=256),
    )


_PRESETS = {
    "toy2d": _toy2d,
    "mnist": _mnist,
    "fmnist": _fmnist,
    "cifar10": _cifar10,
    "celeba": _celeba,
    "imagenet64": _imagenet64,
}


def list_presets() -> list[str]:
    return sorted(_PRESETS)


def get_preset(name: str) -> Config:
    if name not in _PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {list_presets()}")
    return _PRESETS[name]()


# ---------------------------------------------------------------------------
# CLI overrides: --train.batch_size=128 --refine.steps=50 --model.kind=dcgan
# ---------------------------------------------------------------------------


def _cast(value: str, typ: Any) -> Any:
    if typ is bool:
        if value.lower() in ("1", "true", "yes", "on"):
            return True
        if value.lower() in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"cannot parse bool from {value!r}")
    return typ(value)


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply ``a.b=c`` style dotted overrides to a frozen config tree."""
    for ov in overrides:
        ov = ov.lstrip("-")
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not of the form key=value")
        dotted, value = ov.split("=", 1)
        path = dotted.split(".")
        cfg = _set_path(cfg, path, value)
    return cfg


def _set_path(node: Any, path: list[str], value: str) -> Any:
    name = path[0]
    fields = {f.name: f for f in dataclasses.fields(node)}
    if name not in fields:
        raise KeyError(
            f"{type(node).__name__} has no field {name!r}; "
            f"have {sorted(fields)}")
    if len(path) == 1:
        typ = type(getattr(node, name))
        return dataclasses.replace(node, **{name: _cast(value, typ)})
    child = _set_path(getattr(node, name), path[1:], value)
    return dataclasses.replace(node, **{name: child})
