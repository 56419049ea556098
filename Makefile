.PHONY: test test-fast native bench clean

native:
	g++ -O3 -march=native -fopenmp -shared -fPIC csrc/naqs_host.cpp -o build/libnaqs_host.so || mkdir -p build && g++ -O3 -march=native -fopenmp -shared -fPIC csrc/naqs_host.cpp -o build/libnaqs_host.so

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_cli.py --ignore=tests/test_train_e2e.py --ignore=tests/test_molecule_zoo.py

bench:
	python bench.py

clean:
	rm -rf build __pycache__ naqs_tpu/__pycache__ .pytest_cache
