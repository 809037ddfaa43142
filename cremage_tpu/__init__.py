"""cremage_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image & video generation framework.

A from-scratch rebuild of the capabilities of HowToSD/cremage (reference mounted at
/root/reference; see SURVEY.md) designed idiomatically for TPU:

- model graphs are Flax modules compiled by XLA (bf16 compute / fp32 accumulation),
- sampler loops are pure `step` functions driven by `jax.lax.scan`,
- hot attention paths use Pallas flash-attention kernels,
- multi-chip scaling is a `jax.sharding.Mesh` with pjit/GSPMD collectives
  (batch data-parallel by default, optional tensor-parallel attention heads),
- LoRA / ControlNet / IP-Adapter are functional weight/graph transforms applied
  at load/trace time rather than runtime module surgery.

Layer map (bottom-up; mirrors SURVEY.md §7 build plan):
    core/      dtype policy, RNG semantics, mesh helpers, config system, registry
    ops/       Pallas kernels + fused compute ops (attention, groupnorm, resize)
    models/    Flax model graphs (UNet, VAE, CLIP, OpenCLIP, T5, MMDiT, ControlNet...)
    samplers/  sigma schedules + DDIM / k-diffusion / EDM samplers + guiders
    io/        safetensors/ckpt <-> pytree loaders, LoRA merge, PNG metadata
    prompt/    weight grammar, TI tags, chunking, wildcards, history
    pipelines/ per-model-family generate() entry points
    parallel/  sharding strategies over the device mesh
    services/  safety, watermark, face fix, upscalers, annotators
    app/       job queue + worker, CLI, server
"""

__version__ = "0.1.0"

# Version of the reference whose behavior contract we implement.
REFERENCE_VERSION = "cremage 4.0.1"


def __getattr__(name):
    """Lazy top-level API (keeps `import cremage_tpu` light)."""
    lazy = {
        "GenerationOptions": "cremage_tpu.core.config",
        "Preferences": "cremage_tpu.core.config",
        "load_preferences": "cremage_tpu.core.config",
        "SD15Pipeline": "cremage_tpu.pipelines.sd15",
        "SDXLPipeline": "cremage_tpu.pipelines.sdxl",
        "SD3Pipeline": "cremage_tpu.pipelines.sd3",
        "FluxPipeline": "cremage_tpu.pipelines.flux",
        "PixArtPipeline": "cremage_tpu.pipelines.pixart",
        "SVDPipeline": "cremage_tpu.pipelines.svd",
        "load_sd15_bundle": "cremage_tpu.pipelines.loader",
        "load_sdxl_bundle": "cremage_tpu.pipelines.loader",
        "load_sd3_bundle": "cremage_tpu.pipelines.loader",
        "load_flux_bundle": "cremage_tpu.pipelines.loader",
        "load_pixart_bundle": "cremage_tpu.pipelines.loader",
        "load_svd_bundle": "cremage_tpu.pipelines.loader",
        "EngineWorker": "cremage_tpu.app.worker",
        "ApiServer": "cremage_tpu.app.server",
        "register_default_backends": "cremage_tpu.app.backends",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(name)
