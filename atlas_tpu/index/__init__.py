from atlas_tpu.index.flat import DistributedIndex
from atlas_tpu.index.docstore import DocStore
