#!/usr/bin/env bash
# Offline token precompute over a dataset zoo entry
# (counterpart of reference scripts/precompute_tokens_slurm.sh).
#
# Usage: ./scripts/precompute_tokens.sh cc12m /data/shards 100000
set -euo pipefail
DATASET=${1:?dataset name (see unidisc_tpu/data/hf_datasets.py)}
OUT=${2:?output dir}
N=${3:-100000}

python - "$DATASET" "$OUT" "$N" <<'PY'
import sys

from unidisc_tpu.data.hf_datasets import hf_image_caption_stream
from unidisc_tpu.data.precompute import precompute_tokens
from unidisc_tpu.tokenizers.image_codecs import get_codec
from unidisc_tpu.tokenizers.text import get_tokenizer

name, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
tokenizer = get_tokenizer("byte")  # swap for llama-2 when cached
codec = get_codec("llamagen-vq16", image_size=256)
# load real VQ weights when available:
# codec = load_vqgan_torch_checkpoint(codec, "vq_ds16_c2i.pt")
dirs = precompute_tokens(
    hf_image_caption_stream(name, image_size=256, limit=n), out,
    tokenizer=tokenizer, codec=codec, txt_length=128,
    text_vocab_size=tokenizer.vocab_size + 1)
print(f"wrote {len(dirs)} shards")
PY
