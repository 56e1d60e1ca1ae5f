# Common commands
.PHONY: test test-fast bench demo lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_pipeline.py \
	  --ignore=tests/test_npr.py --ignore=tests/test_train_integration.py

bench:
	python bench.py

demo:
	LAENERF_PLATFORM=cpu python examples/recolor_demo.py
