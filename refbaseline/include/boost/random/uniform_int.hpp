// boost::uniform_int<> — distribution object callable with an engine.
#pragma once
#include <random>

namespace boost {

template <class IntType = int>
class uniform_int {
    IntType lo_, hi_;

public:
    uniform_int(IntType lo, IntType hi) : lo_(lo), hi_(hi) {}

    template <class Engine>
    IntType operator()(Engine& eng) const
    {
        std::uniform_int_distribution<IntType> d(lo_, hi_);
        return d(eng);
    }
};

namespace random { using boost::uniform_int; }

}  // namespace boost
