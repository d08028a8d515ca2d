from .ring import yukawa_field_ring
from .shards import (
    device_mesh,
    field3_sharding,
    field3v_sharding,
    node_sharding,
    pad_axis_to_multiple,
    replicated,
    source_sharding,
)

__all__ = [
    "yukawa_field_ring",
    "device_mesh",
    "node_sharding",
    "field3_sharding",
    "field3v_sharding",
    "source_sharding",
    "replicated",
    "pad_axis_to_multiple",
]
