from textocvp_tpu.ops.slot_attention import SlotAttention
