from .mesh import create_mesh, gallery_sharding
from .gallery import all_pairs_scores, shard_gallery
