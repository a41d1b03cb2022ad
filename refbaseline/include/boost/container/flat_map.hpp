// boost::container::flat_map stand-in: std::map has the same ordered-map
// semantics; the flat (contiguous) representation is a performance detail
// the shim does not reproduce.
#pragma once
#include <map>
#include <functional>

namespace boost { namespace container {

template <class Key, class T, class Compare = std::less<Key>, class Sequence = void>
using flat_map = std::map<Key, T, Compare>;

template <class Key, class T, class Compare = std::less<Key>, class Sequence = void>
using flat_multimap = std::multimap<Key, T, Compare>;

}}  // namespace boost::container
