// boost::container::small_vector stand-in — std::vector without the
// small-buffer optimization (a performance detail only).
#pragma once
#include <vector>
#include <cstddef>

namespace boost { namespace container {

template <class T, std::size_t N, class Allocator = std::allocator<T>>
using small_vector = std::vector<T, Allocator>;

}}  // namespace boost::container
