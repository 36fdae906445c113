# Developer conveniences. The native codec also builds itself lazily at
# first use (seq2squiggle_tpu/io/native/build.py).

.PHONY: install test test-smoke bench native clean

install:
	pip install -e . --no-deps --no-build-isolation

test:
	python -m pytest tests/ -q

# Fast gating subset (~2 min on a 1-core host): format goldens, writers,
# batcher, CLI — the modules that don't trigger long XLA compiles.
test-smoke:
	python -m pytest tests/ -q -m smoke

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -std=c++17 \
	  seq2squiggle_tpu/io/native/slow5_codec.cc \
	  -o seq2squiggle_tpu/io/native/libslow5codec.so -lz

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
