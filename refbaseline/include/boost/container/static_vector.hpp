#pragma once
#include <vector>
#include <cstddef>

namespace boost { namespace container {

template <class T, std::size_t N>
using static_vector = std::vector<T>;

}}  // namespace boost::container
