"""Native C++ host-side components (compiled on first use via g++).

- ``loa.cpp``      — LOA greedy layout reorderer (reference LOI.cpp:660-805)
- ``preprocess.cpp`` — OpenMP window analyzer (reference hybrid_all_kernel.cu:213-408)
"""
