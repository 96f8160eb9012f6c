PYTHON ?= python

.PHONY: test lint bench native clean

test:
	$(PYTHON) -m pytest tests/ -q

lint:
	$(PYTHON) -m flake8 graphdot_tpu/ tests/ --max-line-length=79 \
	    --extend-ignore=E203,W503 || true

bench:
	$(PYTHON) bench.py

native:
	g++ -O3 -march=native -shared -fPIC \
	    -o graphdot_tpu/native/_packer.so graphdot_tpu/native/packer.cpp

clean:
	rm -f graphdot_tpu/native/_packer.so
	find . -name __pycache__ -type d -exec rm -rf {} +
