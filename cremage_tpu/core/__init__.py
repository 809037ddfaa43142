from cremage_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from cremage_tpu.core.rng import resolve_seed, key_for_image, noise_like
from cremage_tpu.core.mesh import make_mesh, data_sharding, replicated
from cremage_tpu.core.registry import Registry
