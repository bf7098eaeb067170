from .elem import SynthesisElem, stack_elems

__all__ = ["SynthesisElem", "stack_elems"]
