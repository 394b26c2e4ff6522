# Developer shortcuts. `make test` is the canonical check.

PY ?= python

.PHONY: test test-fast bench data native clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not trainer and not particle and not voliro_dataset"

bench:
	$(PY) bench.py

# Generate the self-contained benchmark datasets.
data:
	$(PY) create_datasets/create_spring_nonlinear.py --seed 0 --out cbfssm_tpu/data/data/spring_nonlinear.mat
	$(PY) create_datasets/create_robomove.py --partial --seed 0 --out cbfssm_tpu/data/data/robomove.mat
	$(PY) create_datasets/create_robomove.py --seed 0 --out cbfssm_tpu/data/data/robomove_simple.mat

native:
	$(PY) -c "from cbfssm_tpu import native; assert native.available(); print('hostloader ok')"

clean:
	rm -rf build dist *.egg-info .pytest_cache cbfssm_tpu/native/_hostloader*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
