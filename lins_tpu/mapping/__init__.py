from lins_tpu.mapping.keyframes import (
    KeyframeStore, empty_store, add_keyframe, set_poses, assemble_local_map)
from lins_tpu.mapping.scan2map import scan_to_map
from lins_tpu.mapping.mapper import LinsMapper, MapperState, init_mapper
