from textocvp_tpu.data.loader import DataLoader, load_data, unwrap_batch
from textocvp_tpu.data.tokenizers import CustomTokenizer, get_tokenizer
from textocvp_tpu.data.wire import as_float_video, to_uint8_frames
