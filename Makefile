# Convenience targets; tests force the hermetic CPU mesh via tests/conftest.py.

.PHONY: test test-slow bench native clean

test:
	python -m pytest tests/ -q

test-slow:
	python -m pytest tests/ -q -m slow

bench:
	python bench.py

native:
	sh tools/build_native.sh

clean:
	rm -f native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
