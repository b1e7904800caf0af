"""Mutable string type used by the genome mutators."""


class MutableString:
    def __init__(self, data):
        self.data = list(data)

    def __str__(self):
        return ''.join(self.data)

    def __repr__(self):
        return str(self)

    def __eq__(self, other):
        return str(self) == str(other)

    def __add__(self, chars):
        return MutableString(''.join(self.data) + str(chars))

    def __iadd__(self, chars):
        self.data.extend(list(str(chars)))
        return self

    def __contains__(self, teststr):
        return teststr in str(self)

    def __setitem__(self, index, value):
        self.data[index] = value

    def __getitem__(self, index):
        if isinstance(index, slice):
            return ''.join(self.data[index])
        return self.data[index]

    def __delitem__(self, index):
        del self.data[index]

    def __len__(self):
        return len(self.data)
