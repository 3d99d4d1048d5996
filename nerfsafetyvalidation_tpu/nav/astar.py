"""A* on a 3-D occupancy grid.

Parity target: reference nav/quad_helpers.py:201-258 — 6-connected grid,
unit edge cost, euclidean heuristic, raises ValueError when no path exists
(the failure-detection hook validate.py:313-341 relies on). Host-side; a
C++ implementation with the same contract is used when the native extension
is built (native/), this is the pure-python fallback.
"""

import heapq

import numpy as np


def astar(occupied, start, goal):
    occupied = np.asarray(occupied)
    assert not occupied[start], "start cell is occupied"
    assert not occupied[goal], "goal cell is occupied"

    # try the native C++ implementation first
    try:
        from ..native import lib as _native
        if _native.available():
            path = _native.astar(occupied, start, goal)
            if path is None:
                raise ValueError("Failed to find path!")
            return [tuple(p) for p in path]
    except ImportError:
        pass

    def heuristic(a, b):
        return np.sqrt((b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                       + (b[2] - a[2]) ** 2)

    def inbounds(point):
        for x, size in zip(point, occupied.shape):
            if x < 0 or x >= size:
                return False
        return True

    neighbors = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                 (0, 0, 1), (0, 0, -1)]
    close_set = set()
    came_from = {}
    gscore = {start: 0}
    open_heap = []
    heapq.heappush(open_heap, (heuristic(start, goal), start))

    while open_heap:
        current = heapq.heappop(open_heap)[1]
        if current == goal:
            data = []
            while current in came_from:
                data.append(current)
                current = came_from[current]
            assert current == start
            data.append(current)
            return list(reversed(data))
        close_set.add(current)
        for i, j, k in neighbors:
            neighbor = (current[0] + i, current[1] + j, current[2] + k)
            if not inbounds(neighbor) or occupied[neighbor]:
                continue
            tentative = gscore[current] + 1
            if tentative < gscore.get(neighbor, float("inf")):
                came_from[neighbor] = current
                gscore[neighbor] = tentative
                fscore = tentative + heuristic(neighbor, goal)
                node = (fscore, neighbor)
                if node not in open_heap:
                    heapq.heappush(open_heap, node)

    raise ValueError("Failed to find path!")
