// boost::thread_group -> std::thread pool (parallel_read.cc:33-41).
#ifndef CK_REF_SHIM_THREAD_THREAD_HPP
#define CK_REF_SHIM_THREAD_THREAD_HPP

#include <thread>
#include <vector>

namespace boost {

class thread_group {
public:
    template <class F>
    void create_thread(F f) {
        threads_.emplace_back(std::move(f));
    }
    void join_all() {
        for (auto &t : threads_)
            if (t.joinable()) t.join();
    }
private:
    std::vector<std::thread> threads_;
};

}  // namespace boost

#endif
