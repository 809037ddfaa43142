"""The examples/ scripts must keep parsing and importing real symbols."""
import ast
import importlib
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("fname", sorted(
    f for f in os.listdir(EXAMPLES) if f.endswith(".py")))
def test_example_imports_resolve(fname):
    tree = ast.parse(open(os.path.join(EXAMPLES, fname)).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module \
                and node.module.startswith("cremage_tpu"):
            mod = importlib.import_module(node.module)
            for alias in node.names:
                assert hasattr(mod, alias.name), (
                    fname, node.module, alias.name)
