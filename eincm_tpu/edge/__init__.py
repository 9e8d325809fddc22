from eincm_tpu.edge.pipeline import (
    preprocess_image,
    image_to_edge,
    smoothen_edges,
    eincm_inv_exp_dist_transform,
    rtef_inv_exp_dist_transform,
    extract_edges,
)
