"""Data layer: multimodal sequence engine, datasets, loaders."""

from . import multiseq
from .multiseq import (MultiseqDataset, seq_collate, seq_collate_dict,
                       seq_decoll, seq_decoll_dict, len_to_mask,
                       mask_to_extent, rand_delete, burst_delete,
                       keep_segment, del_segment)
