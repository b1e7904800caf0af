"""Progress logging with decreasing update frequency."""

import kevlar_tpu


class ProgressIndicator:
    def __init__(self, message, interval=10, breaks=(100, 1000, 10000),
                 usetimer=False):
        self.message = message
        self.counter = 0
        self.interval = interval
        self.nextupdate = interval
        self.breaks = list(breaks)
        self.timer = None
        if usetimer:
            self.timer = kevlar_tpu.Timer()
            self.timer.start()

    def update(self, n=1):
        if self.counter in self.breaks:
            self.interval = self.counter
        if self.counter >= self.nextupdate:
            self.nextupdate += self.interval
            message = self.message.format(counter=self.counter)
            if self.timer:
                message += ' ({:.2f} seconds elapsed)'.format(
                    self.timer.probe())
            kevlar_tpu.plog(message)
        self.counter += n
