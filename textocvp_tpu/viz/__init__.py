from textocvp_tpu.viz.figures import (
    add_border,
    make_gif,
    masks_to_rgb,
    overlay_segmentations,
    visualize_decomp,
    visualize_metric,
    visualize_qualitative_eval,
    visualize_recons,
    visualize_sequence,
)
