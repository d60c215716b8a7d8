# Convenience targets (the reference drives everything through make too,
# /root/reference/Makefile). The Python package needs no build step; the
# native helpers compile on demand (scrooge_tpu/native). Targets:

PY ?= python

.PHONY: test test-fast bench native example sweep accuracy clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not pallas and not parallel"

bench:
	$(PY) bench.py

native:
	$(PY) -c "from scrooge_tpu import native; assert native.get_lib(), 'native build failed'; print('native lib OK')"

example:
	$(PY) examples/library_example.py

sweep:
	$(PY) -m scrooge_tpu.profiling.sweep device simulated:256:2000 --profile_dir=profile

accuracy:
	$(PY) -m scrooge_tpu.profiling.sweep groundtruth simulated:256:4000 --max_experiments=8 --max_W=128 --profile_dir=profile
	$(PY) -m scrooge_tpu.profiling.sweep baselines simulated:256:2000 --profile_dir=profile

clean:
	rm -rf .jax_cache profile scrooge_tpu/native/_cigar_strings.so
	find . -name __pycache__ -type d -exec rm -rf {} +
