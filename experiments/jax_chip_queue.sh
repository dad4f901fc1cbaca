#!/bin/bash
# Sequential jax-side protocol runs on the one real chip (one TPU client at
# a time). Run AFTER the amazon corpus defaults are pinned; the torch
# column runs concurrently on CPU via run_protocol_queue.py.
set -x
cd "$(dirname "$0")/.."
PP="python experiments/protocol_parity.py --protocol amazon --verbose 0 --hybrid-k auto"
$PP --frameworks jax --seeds 42 43 44
$PP --frameworks jax --model egcn --seeds 42 43 44 45 46 47 48 49
$PP --frameworks jax --model jk --seeds 42 43 44
$PP --frameworks jax --hierarchy perlevel --seeds 42 43 44
$PP --frameworks jax --hierarchy perlevel --model egcn --seeds 42 43 44
$PP --frameworks jax --hierarchy perlabel --ep --seeds 42 43 44
python experiments/mlp_parity.py --protocol amazon --frameworks jax --verbose 0 --seeds 42 43 44
