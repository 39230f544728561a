# ssqueeze_rs_tpu developer entry points

.PHONY: test bench smoke fuzz native examples clean

test:            ## CPU suite (8 virtual devices, float64)
	python -m pytest tests/ -q

bench:           ## headline metric on the attached TPU (one JSON line)
	python bench.py

smoke:           ## behavioral smoke on the attached TPU
	python tools/tpu_smoke.py

fuzz:            ## randomized on-chip config fuzz
	python tools/tpu_fuzz.py

native:          ## build the C++ host runtime (libssq_native.so)
	$(MAKE) -C native

examples:        ## run the CPU-friendly examples
	JAX_PLATFORMS=cpu python examples/readme_example.py
	JAX_PLATFORMS=cpu python examples/component_separation.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
