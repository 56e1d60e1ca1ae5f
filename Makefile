# Common commands
.PHONY: test test-fast bench demo lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"


bench:
	python bench.py

demo:
	LAENERF_PLATFORM=cpu python examples/recolor_demo.py
