.PHONY: test bench native examples clean ci

test:
	python3 -m pytest tests/ -q

bench:
	python3 bench.py

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	    native/path_optimizer.cpp -o native/libtnt_path.so

examples:
	python3 examples/qtt_stretch.py
	python3 examples/qtt_screened_poisson.py
	python3 examples/inner_product_scaling.py

ci: native test

clean:
	rm -f native/libtnt_path.so
	find . -name __pycache__ -type d -exec rm -rf {} +
