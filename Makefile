PY ?= python

.PHONY: native test bench clean

native: onephase_tpu/native/_structure.so

onephase_tpu/native/_structure.so: onephase_tpu/native/structure.cpp
	g++ -O3 -shared -fPIC -std=c++17 $< -o $@

test: native
	$(PY) -m pytest tests/ -q

bench: native
	$(PY) bench.py

clean:
	rm -f onephase_tpu/native/_structure.so
	find . -name __pycache__ -type d -exec rm -rf {} +
