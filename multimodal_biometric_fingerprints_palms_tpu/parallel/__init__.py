from .mesh import create_mesh, gallery_sharding
from .gallery import (all_pairs_scores, all_pairs_unique, shard_gallery,
                      shard_pairs_scores, shard_pairs_screen, unique_pairs,
                      identify, pad_gallery)
