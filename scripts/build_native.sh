#!/bin/bash
# Build the native host-runtime extensions (textocvp_tpu/native/).
# The data loaders fall back to PIL automatically when this is not run;
# building it removes Python/PIL overhead from the hot PNG decode path.
set -e
cd "$(dirname "$0")/.."
python -c "
from textocvp_tpu import native
ok = native.build(verbose=True)
print('native imgio:', 'built at ' + native._LIB_PATH if ok else 'BUILD FAILED')
assert ok
print('available:', native.available())
"
