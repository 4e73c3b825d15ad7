"""Training controllers: sliding-mean early stopping.

Stops when the validation loss exceeds the mean of the last ``length``
epochs; incremental O(1) mean update. Reference:
h2gcn/modules/controller.py:4-30 (``length=0`` disables).
"""

from collections import deque


class SlidingMeanEarlyStopping:
    def __init__(self, length: int):
        self.epoch_history = deque(maxlen=length)
        self._mean_value = 0.0

    @property
    def length(self):
        return self.epoch_history.maxlen

    def reset(self):
        self.epoch_history.clear()
        self._mean_value = 0.0

    def __call__(self, value) -> bool:
        value = float(value)
        if self.length > 0:
            if len(self.epoch_history) == self.length and value > self._mean_value:
                return True
            if len(self.epoch_history) == self.length:
                self._mean_value -= self.epoch_history.popleft() / self.length
            self.epoch_history.append(value)
            self._mean_value += value / self.length
            return False
        return False
