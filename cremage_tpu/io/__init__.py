from cremage_tpu.io.checkpoint import (
    load_state_dict,
    build_flax_params,
    overlay,
    save_safetensors,
)
from cremage_tpu.io.lora import merge_lora, parse_lora_option_string
from cremage_tpu.io.ti import load_embedding
from cremage_tpu.io.metadata import (
    save_png_with_metadata,
    read_generation_data,
    image_from_array,
    array_from_image,
)
