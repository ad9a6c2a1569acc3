from atlas_tpu.core.atlas import Atlas
