#!/bin/bash
# Round-2 end-to-end soak on the real chip: precompute -> streamed
# training under SIGTERM mid-run (signal checkpoint) -> resume ->
# generate. Exercises the round-2 surface (streaming shards with exact
# mid-epoch resume, signal-checkpointing, EMA generation) the way the
# round-1 soak exercised the core loop.
set -e
cd /root/repo
RUN=${1:-/tmp/soak_r2}
rm -rf "$RUN"; mkdir -p "$RUN"

echo "== precompute token shards =="
python -m unidisc_tpu.data.precompute --out "$RUN/mm" --n 2048 \
    --codec dummy --txt-length 16 --shard-size 1024

echo "== convert memmap shards to streaming npz shards =="
python - "$RUN" << 'EOF'
import sys

import numpy as np

from unidisc_tpu.data.streaming import write_stream_shards
from unidisc_tpu.data.token_shards import TokenShardDataset

run = sys.argv[1]
import glob
toks = []
mods = []
for d in sorted(glob.glob(f"{run}/mm/shard_*")):
    ds = TokenShardDataset(d)
    batch = ds.get(np.arange(len(ds)))
    toks.append(batch["input_ids"])
    mods.append(batch.get("modality"))
tokens = np.concatenate(toks)
modality = (np.concatenate(mods) if mods[0] is not None else None)
write_stream_shards(f"{run}/stream", tokens, modality=modality,
                    rows_per_shard=256)
print(f"wrote {len(tokens)} rows -> {run}/stream")
EOF

echo "== phase 1: streamed training, SIGTERM mid-run =="
# timeout -k: hard-kill if the graceful checkpoint wedges (tunnel stalls)
timeout -k 30 600 python -m unidisc_tpu.train model=tiny \
    trainer.max_steps=400 trainer.global_batch_size=128 \
    --data "$RUN/stream" --stream --run-dir "$RUN/run" \
    --ckpt-every 100 --log-every 20 &
PID=$!
sleep 300 && kill -TERM $PID 2>/dev/null || true
wait $PID || true
echo "phase 1 done (killed or finished)"

echo "== phase 2: resume to completion =="
timeout -k 30 900 python -m unidisc_tpu.train model=tiny \
    trainer.max_steps=400 trainer.global_batch_size=128 \
    --data "$RUN/stream" --stream --run-dir "$RUN/run" \
    --ckpt-every 100 --log-every 20

echo "== phase 3: generate from the trained checkpoint =="
timeout 600 python -m unidisc_tpu.generate --ckpt "$RUN/run" \
    --out "$RUN/gen" --seed 3 --use-ema

echo "== soak OK =="
ls -la "$RUN/gen" 2>/dev/null | head
